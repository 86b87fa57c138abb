"""OptimFunction: a chain of function blocks and its parameter layout.

Capability parity target (reference, behaviour only):
pyCamSet/optimisation/abstract_function_blocks.py:111-686 (optimisation_
function: right-to-left evaluation, memory plans, parameter slices, per-point
param index tables) and make_param_struct (:777-820). The reference generates
numba source for the fused loss/jacobian; here the chain is composed into one
pure per-detection function, vmapped and jitted, with gather index tables
playing the role of the reference's compressed per-point param tables
(:192-233).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pycamset_tpu.optim.blocks import FunctionBlock, ParamSpec, key_type


@dataclass
class ParamStruct:
    """Global parameter layout for a block chain on a given problem size.

    The full parameter vector is the concatenation of each unique param
    group's (count, n) table, in order of first appearance in the chain —
    e.g. [intr 9/cam | extr 6/cam | pose 6/im | points 3/key], matching the
    reference layout (template_handler.py:52-60).
    """
    groups: list[ParamSpec]
    counts: list[int]
    starts: np.ndarray = field(init=False)
    total: int = field(init=False)

    def __post_init__(self):
        sizes = [g.n * c for g, c in zip(self.groups, self.counts)]
        self.starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
        self.total = int(np.sum(sizes))

    def group_slice(self, gi: int) -> slice:
        return slice(int(self.starts[gi]),
                     int(self.starts[gi]) + self.groups[gi].n * self.counts[gi])

    def build_cols(self, cam_idx: np.ndarray, im_idx: np.ndarray,
                   key_idx: np.ndarray,
                   group_idx: np.ndarray | None = None) -> np.ndarray:
        """Per-detection gather indices into the full parameter vector.

        :param group_idx: per-detection PER_GROUP index (required iff the
            chain has PER_GROUP parameters).
        :return: (N, L) int32 where L = sum of unique-group param counts.
        """
        link_cols = {key_type.PER_CAM: cam_idx, key_type.PER_IMG: im_idx,
                     key_type.PER_KEY: key_idx, key_type.PER_GROUP: group_idx}
        parts = []
        for g, start in zip(self.groups, self.starts):
            if g.link == key_type.SINGLE:
                idx = np.zeros_like(cam_idx)
            else:
                idx = link_cols[g.link]
                if idx is None:
                    raise ValueError(f"chain needs a {g.link.name} index column")
            parts.append(start + idx[:, None] * g.n + np.arange(g.n)[None, :])
        return np.concatenate(parts, axis=1).astype(np.int32)


class OptimFunction:
    """A chain of function blocks, evaluated right-to-left."""

    def __init__(self, blocks: list[FunctionBlock]):
        self.blocks = list(blocks)
        # dedupe param groups by spec, order of first appearance
        self.groups: list[ParamSpec] = []
        self.block_group: list[int] = []
        for b in self.blocks:
            if b.params in self.groups:
                self.block_group.append(self.groups.index(b.params))
            else:
                self.block_group.append(len(self.groups))
                self.groups.append(b.params)
        # local (per-detection) parameter slices, one per unique group
        offs = np.concatenate([[0], np.cumsum([g.n for g in self.groups])])
        self.local_slices = [slice(int(a), int(b))
                             for a, b in zip(offs[:-1], offs[1:])]
        self.local_len = int(offs[-1])
        self.templated = any(b.template for b in self.blocks)
        # per-detection auxiliary input channels (e.g. the normalized
        # image row of a rolling-shutter chain); they ride extra columns
        # of the observation table
        self.aux_width = max(
            (getattr(b, "aux_inputs", 0) for b in self.blocks), default=0)

    def __add__(self, other):
        if isinstance(other, FunctionBlock):
            return OptimFunction(self.blocks + [other])
        if isinstance(other, OptimFunction):
            return OptimFunction(self.blocks + other.blocks)
        return NotImplemented

    def can_make_jac(self) -> bool:
        return True  # jacfwd always exists for a traced chain

    # ------------------------------------------------------------- evaluation

    def make_point_fn(self):
        """The fused per-detection prediction function.

        :return: fn(local_params (L,), template_pt (3,)[, aux (A,)]) ->
            (num_out,) — typically the predicted pixel (2,). The ``aux``
            argument exists only when the chain has aux-consuming blocks
            (``aux_width > 0``; e.g. the rolling-shutter row channel).
        """
        blocks = self.blocks
        slices = [self.local_slices[gi] for gi in self.block_group]

        def eval_chain(local_params, template_pt, aux):
            inp = None
            for b, sl in zip(reversed(blocks), reversed(slices)):
                p = local_params[sl]
                src = (template_pt if b.template
                       else (None if b.num_inp == 0 else inp))
                if getattr(b, "aux_inputs", 0):
                    inp = b.compute(p, src, aux)
                else:
                    inp = b.compute(p, src)
            return inp

        if self.aux_width:
            def point_fn_aux(local_params, template_pt, aux):
                return eval_chain(local_params, template_pt, aux)
            return point_fn_aux

        def point_fn(local_params, template_pt):
            return eval_chain(local_params, template_pt, None)

        return point_fn

    def make_local_assembler(self):
        """fn(cam_p, im_p, key_p) -> chain-group-ordered local vector.

        The structured backend carries parameters as per-link pieces
        ([cam cols | im cols | key cols], each link's groups in chain
        order); ``make_point_fn`` wants them in CHAIN-GROUP order. For
        chains whose groups are already cam*, im*, key*-ordered this is
        a plain concatenation; out-of-order chains (e.g. rolling shutter,
        whose per-camera readout group follows the per-image pose group)
        get the permuting assembly.
        """
        import jax.numpy as jnp

        plan = []
        cursor = {}
        for g in self.groups:
            link = (key_type.PER_KEY if g.link == key_type.PER_GROUP
                    else g.link)
            s = cursor.get(link, 0)
            plan.append((link, s, g.n))
            cursor[link] = s + g.n

        def assemble(cam_p, im_p, key_p):
            src = {key_type.PER_CAM: cam_p, key_type.PER_IMG: im_p,
                   key_type.PER_KEY: key_p}
            return jnp.concatenate(
                [src[link][s:s + n] for link, s, n in plan])

        return assemble

    def param_struct(self, n_cams: int, n_ims: int, n_keys: int,
                     n_groups: int = 0) -> ParamStruct:
        """Instantiate the global parameter layout for a problem size."""
        count_of = {key_type.PER_CAM: n_cams, key_type.PER_IMG: n_ims,
                    key_type.PER_KEY: n_keys, key_type.SINGLE: 1,
                    key_type.PER_GROUP: n_groups}
        return ParamStruct(self.groups, [count_of[g.link] for g in self.groups])
