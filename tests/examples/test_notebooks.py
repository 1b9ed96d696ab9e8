"""Notebook tutorials: validate and execute the rendered .ipynb files
(the narrative counterparts of the reference's notebook tutorials)."""
import glob
import os

import pytest

nbformat = pytest.importorskip("nbformat")

NB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "examples", "notebooks")
NOTEBOOKS = sorted(glob.glob(os.path.join(NB_DIR, "*.ipynb")))

pytestmark = pytest.mark.slow


def test_notebooks_exist():
    names = {os.path.basename(p) for p in NOTEBOOKS}
    assert {"getting_started.ipynb", "gp_regression.ipynb",
            "svgp_regression.ipynb"} <= names


@pytest.mark.parametrize("path", NOTEBOOKS,
                         ids=[os.path.basename(p) for p in NOTEBOOKS])
def test_notebook_executes(path):
    nb = nbformat.read(path, as_version=4)
    nbformat.validate(nb)
    src = "\n".join(c.source for c in nb.cells
                    if c.cell_type == "code")
    exec(compile(src, path, "exec"), {"__name__": "__notebook__"})
