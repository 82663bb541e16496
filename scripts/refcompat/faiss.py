"""faiss import shim: utils/nearest_neighbors.py imports faiss at module
load, but the reference's train/evaluate flow never constructs an index.
Classes raise on construction so any accidental use is loud."""


def _unavailable(name):
    raise NotImplementedError(
        f"refcompat faiss.{name}: FAISS is not installed in this environment; "
        "the reference rerun covers train/evaluate only (ANN quality numbers "
        "come from the framework's own retrieval benchmark harness)"
    )


class IndexLSH:
    def __init__(self, *a, **k):
        _unavailable("IndexLSH")


class IndexFlatL2:
    def __init__(self, *a, **k):
        _unavailable("IndexFlatL2")


class IndexIVFFlat:
    def __init__(self, *a, **k):
        _unavailable("IndexIVFFlat")
