# Sphinx configuration (reference parity: doc/source/conf.py + the Pages
# deploy workflow).  Build: `sphinx-build doc/source doc/build`.
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "stereomatch_tpu"
author = "stereomatch_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]

# Markdown architecture/parity docs are included directly from docs/.
myst_enable_extensions = ["tasklist"]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

autodoc_mock_imports = ["cv2", "matplotlib", "PIL"]
html_theme = "alabaster"
exclude_patterns = []
