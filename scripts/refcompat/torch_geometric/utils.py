"""to_dense_batch shim: imported by the reference, never called."""


def to_dense_batch(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("refcompat to_dense_batch is import-only")
