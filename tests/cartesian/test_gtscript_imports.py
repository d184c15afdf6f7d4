"""Import hook for .gt.py GTScript files
(reference: cartesian/gtscript_imports.py GtsFinder/GtsLoader)."""

import sys
import textwrap

import numpy as np


def test_import_gt_py_file(tmp_path):
    src = textwrap.dedent(
        """
        import numpy as np
        from gt4py_tpu.cartesian import gtscript
        from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

        @gtscript.stencil(backend="numpy")
        def doubled(a: gtscript.Field[np.float64], b: gtscript.Field[np.float64]):
            with computation(PARALLEL), interval(...):
                b = a * 2.0

        CONSTANT = 41
        """
    )
    (tmp_path / "imported_stencils.gt.py").write_text(src)

    from gt4py_tpu.cartesian import gtscript_imports

    with gtscript_imports.enabled(search_path=[tmp_path]):
        import imported_stencils  # noqa: F401

    try:
        assert imported_stencils.CONSTANT == 41
        a = np.ones((3, 3, 3))
        b = np.zeros_like(a)
        imported_stencils.doubled(a, b, origin=(0, 0, 0))
        assert (b == 2.0).all()
        # module metadata points at the real source
        assert imported_stencils.__file__.endswith(".gt.py")
    finally:
        del sys.modules["imported_stencils"]


def test_finder_scoped_uninstall(tmp_path):
    from gt4py_tpu.cartesian import gtscript_imports

    (tmp_path / "scoped_mod.gt.py").write_text("X = 1\n")
    with gtscript_imports.enabled(search_path=[tmp_path]):
        import scoped_mod

        assert scoped_mod.X == 1
    del sys.modules["scoped_mod"]
    try:
        import scoped_mod  # noqa: F811

        raise AssertionError("finder should have been uninstalled")
    except ImportError:
        pass
