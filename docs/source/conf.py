"""Sphinx configuration (mirrors the reference's docs/source/conf.py layout).

Build with `make -C docs html` after `pip install -e ".[docs]"`; the
markdown guides under docs/ are pulled in via myst-parser.
"""
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pycamset_tpu"
author = "pycamset_tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
autodoc_mock_imports = ["cv2", "pyvista", "matplotlib", "PIL"]
html_theme = "furo"
exclude_patterns = []
