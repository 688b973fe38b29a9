"""Map-projection transforms (projections.py) and the graticule overlay
that replaces the reference's cartopy GeoAxes (ref: vis.py:68-126).

No pyproj/cartopy in the environment, so correctness is pinned by the
projections' defining mathematical properties rather than by comparing
against a library: exact round-trips, unit scale on Lambert standard
parallels, unit area distortion for the equal-area projection, and
conformality (isotropic local scale) for the conformal ones."""

import numpy as np
import pytest

from neural_lam_tpu import projections as pj


MEPS_LCC = pj.LambertConformal(
    central_longitude=15.0, central_latitude=63.3,
    standard_parallels=[63.3, 63.3],
)
PROJS = [
    ("lcc2", pj.LambertConformal(central_longitude=-96.0,
                                 central_latitude=23.0,
                                 standard_parallels=[33.0, 45.0])),
    ("lcc1", MEPS_LCC),
    ("laea", pj.LambertAzimuthalEqualArea(central_longitude=10.0,
                                          central_latitude=56.0)),
    ("stere", pj.Stereographic(central_longitude=0.0,
                               central_latitude=90.0)),
    ("merc", pj.Mercator(central_longitude=5.0)),
    ("pc", pj.PlateCarree(central_longitude=0.0)),
]


@pytest.mark.parametrize("name,proj", PROJS, ids=[n for n, _ in PROJS])
def test_roundtrip(name, proj):
    lon, lat = np.meshgrid(np.linspace(-60, 80, 15),
                           np.linspace(20, 80, 13))
    x, y = proj.forward(lon, lat)
    lon2, lat2 = proj.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)


def _local_scales(proj, lon, lat, eps=1e-5):
    """(k_parallel, h_meridian): local scale along each axis, relative to
    true distances on the sphere."""
    R = getattr(proj, "R", pj.EARTH_RADIUS)
    x0, y0 = proj.forward(lon, lat)
    xl, yl = proj.forward(lon + eps, lat)
    xp, yp = proj.forward(lon, lat + eps)
    de = np.radians(eps)
    k = np.hypot(xl - x0, yl - y0) / (R * de * np.cos(np.radians(lat)))
    h = np.hypot(xp - x0, yp - y0) / (R * de)
    return k, h


def test_lcc_unit_scale_on_standard_parallels():
    proj = pj.LambertConformal(central_longitude=-96.0,
                               central_latitude=23.0,
                               standard_parallels=[33.0, 45.0])
    for lat in (33.0, 45.0):
        for lon in (-120.0, -96.0, -60.0):
            k, h = _local_scales(proj, lon, lat)
            np.testing.assert_allclose(k, 1.0, rtol=1e-4)
            np.testing.assert_allclose(h, 1.0, rtol=1e-4)
    # between the parallels the scale dips below 1; outside it exceeds 1
    k_mid, _ = _local_scales(proj, -96.0, 39.0)
    k_out, _ = _local_scales(proj, -96.0, 55.0)
    assert k_mid < 1.0 < k_out


@pytest.mark.parametrize("name,proj", PROJS[:4], ids=["lcc2", "lcc1",
                                                      "laea", "stere"])
def test_conformal_or_equal_area(name, proj):
    lon, lat = np.meshgrid(np.linspace(-30, 50, 7), np.linspace(35, 75, 7))
    if name == "laea":
        # equal-area: |det J| / (R^2 cos(lat)) == 1 everywhere (the full
        # Jacobian — lon/lat axes need not map orthogonally)
        eps, R = 1e-5, proj.R
        x0, y0 = proj.forward(lon, lat)
        xl, yl = proj.forward(lon + eps, lat)
        xp, yp = proj.forward(lon, lat + eps)
        de = np.radians(eps)
        det = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / de**2
        np.testing.assert_allclose(
            det / (R**2 * np.cos(np.radians(lat))), 1.0, rtol=1e-4
        )
    else:
        # conformal: isotropic local scale k == h everywhere
        k, h = _local_scales(proj, lon, lat)
        np.testing.assert_allclose(k, h, rtol=1e-4)


def test_from_descriptor_meps_and_aliases():
    # MEPS npy config style (cartopy class name + kwargs)
    p = pj.from_descriptor({
        "name": "LambertConformal", "central_longitude": 15.0,
        "central_latitude": 63.3, "standard_parallels": [63.3, 63.3],
    })
    assert isinstance(p, pj.LambertConformal)
    x, y = p.forward(15.0, 63.3)
    np.testing.assert_allclose([x, y], [0.0, 0.0], atol=1e-6)
    # proj.4-style aliases
    p2 = pj.from_descriptor({"name": "laea", "lat_0": 56.0, "lon_0": 10.0})
    assert isinstance(p2, pj.LambertAzimuthalEqualArea)
    np.testing.assert_allclose(p2.forward(10.0, 56.0), (0.0, 0.0),
                               atol=1e-6)
    # lat_1/lat_2 fold into standard_parallels
    p3 = pj.from_descriptor({"name": "lcc", "lon_0": -96.0, "lat_0": 23.0,
                             "lat_1": 33.0, "lat_2": 45.0})
    k, h = _local_scales(p3, -96.0, 45.0)
    np.testing.assert_allclose(k, 1.0, rtol=1e-4)
    assert pj.from_descriptor({"name": "none"}) is None
    assert pj.from_descriptor({"name": "whatisthis"}) is None
    assert pj.from_descriptor(None) is None


def test_graticule_covers_extent():
    proj = MEPS_LCC
    # a MEPS-like 500 km domain around the projection origin
    extent = [-250e3, 250e3, -250e3, 250e3]
    meridians, parallels, ticks = pj.graticule(proj, extent)
    assert len(meridians) >= 3 and len(parallels) >= 3
    for _, xs, ys in meridians + parallels:
        assert xs.min() >= extent[0] - 1e-6 and xs.max() <= extent[1] + 1e-6
        assert ys.min() >= extent[2] - 1e-6 and ys.max() <= extent[3] + 1e-6
    assert ticks["bottom"] and ticks["left"]
    # meridian values must be round multiples of the chosen step
    lons = [v for v, _, _ in meridians]
    assert all(abs(v / (lons[1] - lons[0]) - round(v / (lons[1] - lons[0])))
               < 1e-6 for v in lons)


def test_plot_prediction_draws_graticule():
    """plot_prediction on the dummy datastore (laea descriptor) renders
    geographic tick labels — the cartopy-GeoAxes equivalent engages."""
    from neural_lam_tpu import vis
    from neural_lam_tpu.datastore.dummy import DummyDatastore

    ds = DummyDatastore(grid_shape=(15, 14), n_timesteps=5)
    n = ds.num_grid_points
    fig = vis.plot_prediction(np.random.rand(n), np.random.rand(n), ds)
    ax = fig.axes[0]
    labels = [t.get_text() for t in ax.get_xticklabels()]
    assert labels and all("°" in t for t in labels), labels
    import matplotlib.pyplot as plt

    plt.close(fig)
