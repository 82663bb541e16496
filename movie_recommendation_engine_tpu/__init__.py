"""movie_recommendation_engine_tpu — a TPU-native PinSage-class
embedding / retrieval engine built on JAX / XLA / Pallas.

Brand-new framework with the capabilities of the reference
``anisanazim/Movie-Recommendation-Engine`` (PyTorch + PyG + FAISS),
re-designed TPU-first: CSR graphs in HBM, batched on-device random-walk
sampling, importance-pooling GCN as fused gather/einsum programs,
data-parallel pjit training over a device mesh, and on-chip exact/LSH/IVF
retrieval. See SURVEY.md for the capability contract.
"""

__version__ = "0.1.0"

from .config import Config, default_config, small_test_config  # noqa: F401


def __getattr__(name):
    # Lazy: `api` pulls in jax/trainer; keep bare package import light.
    # (importlib, not `from . import api` — that getattr's the package and
    # would re-enter this hook.)
    if name == "api":
        import importlib

        return importlib.import_module(".api", __name__)
    raise AttributeError(name)
