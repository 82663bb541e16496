"""Config serialization/override and CLI parsing tests."""

import pytest

from movie_recommendation_engine_tpu.cli.main import _parse_overrides
from movie_recommendation_engine_tpu.config import Config, default_config


def test_config_json_roundtrip():
    cfg = default_config()
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.to_dict() == cfg.to_dict()


def test_override_types_preserved():
    cfg = default_config().override({
        "train.learning_rate": 3e-4,
        "model.hidden_dim": 128,
        "data.source": "synthetic",
        "graph.use_bipartite_graph": False,
    })
    assert cfg.train.learning_rate == 3e-4
    assert cfg.model.hidden_dim == 128
    assert cfg.data.source == "synthetic"
    assert cfg.graph.use_bipartite_graph is False
    # Original untouched (override returns a new Config).
    assert default_config().model.hidden_dim == 256


def test_override_unknown_key():
    with pytest.raises(KeyError, match="unknown config key"):
        default_config().override({"nope.thing": 1})
    with pytest.raises(KeyError, match="unknown config key"):
        default_config().override({"train.nope": 1})


def test_parse_overrides_literal_eval():
    out = _parse_overrides(["a.b=0.5", "c.d=true_string", "e.f=7", "g.h=False"])
    assert out == {"a.b": 0.5, "c.d": "true_string", "e.f": 7, "g.h": False}


def test_parse_overrides_rejects_missing_equals():
    with pytest.raises(SystemExit):
        _parse_overrides(["noequals"])


def test_k_values_tuple_from_json():
    cfg = default_config()
    cfg2 = Config.from_json(cfg.to_json())
    assert isinstance(cfg2.eval.k_values, tuple)
    assert cfg2.eval.k_values == (10, 50, 100, 500)
