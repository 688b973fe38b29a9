

def test_fieldarray_to_xarray_shim():
    """to_xarray converts when xarray exists, raises a helpful ImportError
    otherwise (xarray is absent from this environment)."""
    import numpy as np
    import pytest

    from neural_lam_tpu.datastore.base import FieldArray

    fa = FieldArray(np.arange(6.0).reshape(2, 3), ("time", "x"),
                    {"time": np.array([0, 1])})
    try:
        import xarray  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="xarray"):
            fa.to_xarray()
    else:
        da = fa.to_xarray()
        assert da.dims == ("time", "x")
        np.testing.assert_array_equal(da.values, fa.values)
