"""Interactive HTML graph export (ref plotly-html equivalent,
ref: neural_lam/plot_graph.py:19-210)."""

import base64
import json
import re

import numpy as np

from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.html_viz import save_interactive_html
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.plot_graph import graph_scene


def test_html_export_embeds_scene(tmp_path):
    ds = DummyDatastore(grid_shape=(30, 28), n_timesteps=20)
    bundle = create_graph(
        str(tmp_path / "g"), ds.get_xy("state", stacked=False),
        n_max_levels=2, hierarchical=True,
    )
    graph = graph_from_bundle(bundle, dense=False)
    grid_xy = ds.get_xy("state")
    point_sets, edge_sets = graph_scene(graph, grid_xy)
    out = save_interactive_html(point_sets, edge_sets,
                                tmp_path / "g.html", title="t")
    html = open(out).read()
    assert "<canvas" in html and "drag: rotate" in html
    m = re.search(r"const SETS = (\[.*?\]);\n", html, re.S)
    sets = json.loads(m.group(1))
    assert len(sets) == len(edge_sets) + len(point_sets)
    # every edge set's base64 payload decodes to (M, 2, 3) float32
    for s, es in zip(sets, edge_sets):
        raw = np.frombuffer(base64.b64decode(s["data"]), np.float32)
        np.testing.assert_allclose(
            raw.reshape(es["segs"].shape), es["segs"], rtol=1e-6
        )
    # per-set checkboxes present
    for s in sets:
        assert f'id="cb_{s["id"]}"' in html
