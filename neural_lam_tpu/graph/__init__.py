"""Graph construction, storage and loading (offline preprocessing)."""

from .build import create_graph, create_graph_from_datastore  # noqa: F401
from .storage import load_graph, save_graph, GraphBundle  # noqa: F401
