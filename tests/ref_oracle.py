"""Import machinery for using the reference implementation as a test oracle.

The reference (read-only at /root/reference) depends on numba / pyvista /
blosc / natsort / uniplot, none of which exist in this environment. Its
numba kernels are plain numpy under an @njit decorator, so stubbing numba
with an identity decorator runs them in pure Python — slow, but EXACT: the
numerical oracle the parity tests want. pyvista & friends are stubbed with
permissive attribute factories (only mesh plotting touches them).

Nothing here copies reference code; it imports and executes the mounted
reference for comparison only.
"""
from __future__ import annotations

import sys
import types

_REF_PATH = "/root/reference"


class _Any:
    """Permissive placeholder: every attribute/call returns another _Any."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return _Any()

    def __getattr__(self, name):
        return _Any()


def _njit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]
    return lambda f: f


class _StubModule(types.ModuleType):
    """Module whose missing attributes resolve to permissive placeholders."""

    def __init__(self, name, attrs):
        super().__init__(name)
        for k, v in attrs.items():
            setattr(self, k, v)

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Any()


class _TypedList(list):
    """numba.typed.List lookalike (append-constructed in the reference)."""

    @staticmethod
    def empty_list(*a, **k):
        return _TypedList()


def _blosc_compress_ptr(address, items, typesize, clevel=3, cname="lz4",
                        shuffle=1):
    """Functional blosc.compress_ptr: real c-blosc frames via the system
    libblosc when present (byte-identical to python-blosc), else the
    pure-Python writer — so the reference's saving module WORKS here and
    its reads/writes are a true interop oracle."""
    import ctypes as _ct
    sys.path.insert(0, "/root/repo")
    from pycamset_tpu.utils import blosc_compat as bc
    data = _ct.string_at(address, items * typesize)
    if bc.native_blosc_available():
        return bc.blosc_compress_native(data, typesize, clevel=clevel,
                                        cname=cname.encode(), shuffle=shuffle)
    return bc.blosc_compress_pure(data, typesize, clevel=clevel)


def _blosc_decompress_ptr(frame, address):
    import ctypes as _ct
    sys.path.insert(0, "/root/repo")
    from pycamset_tpu.utils import blosc_compat as bc
    plain = bc.blosc_decompress(bytes(frame))
    _ct.memmove(address, plain, len(plain))
    return len(plain)


_STUBS = {
    "numba": {"njit": _njit, "prange": range, "int64": int, "float64": float,
              "__path__": []},
    "numba.typed": {"List": _TypedList, "Dict": dict},
    "numba.types": {},
    "numba.core": {},
    "numba.extending": {},
    "pyvista": {},
    "blosc": {"compress": lambda d, **k: d, "decompress": lambda d, **k: d,
              "compress_ptr": _blosc_compress_ptr,
              "decompress_ptr": _blosc_decompress_ptr},
    "natsort": {"natsorted": sorted},
    "uniplot": {"plot": lambda *a, **k: None,
                "histogram": lambda *a, **k: None},
    "coloredlogs": {"install": lambda *a, **k: None},
    "tqdm": {"tqdm": lambda x, **k: x},
}


import contextlib


@contextlib.contextmanager
def reference_stubs():
    """Install the dependency stubs for the duration of the block, then
    remove every stub this block installed from ``sys.modules``.

    Scoping matters: a leaked pyvista stub once made the single-process full
    suite red (product code trusted the counterfeit module). Reference
    modules imported inside the block keep the stub objects they bound; the
    rest of the process never sees them. Reference code paths that import
    lazily at CALL time (e.g. the codegen template modules, which do
    ``from numba import gdb_init``) must run inside this context manager.
    """
    installed: list[str] = []
    for name, attrs in _STUBS.items():
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = _StubModule(name, attrs)
                installed.append(name)
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    try:
        yield
    finally:
        for name in installed:
            sys.modules.pop(name, None)


def import_reference(module: str):
    """Import a pyCamSet module from the mounted reference, stubbing the
    missing heavy dependencies only for the duration of the import.
    Returns the module object."""
    with reference_stubs():
        import warnings
        with warnings.catch_warnings():
            # the read-only reference carries '\i' escapes in plot labels;
            # its SyntaxWarnings are not ours to fix
            warnings.simplefilter("ignore", SyntaxWarning)
            __import__(module)
        return sys.modules[module]
