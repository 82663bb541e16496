"""Interactive demo smoke test (scripted stdin)."""

import builtins
import io

import numpy as np


def test_demo_commands(tmp_path, monkeypatch, capsys, tiny_data):
    from movie_recommendation_engine_tpu.cli.demo import run_demo

    cfg, data = tiny_data
    cfg = cfg.override({
        "paths.checkpoint_dir": str(tmp_path / "ck"),
        "paths.output_dir": str(tmp_path / "out"),
        "train.epochs": 1,
        "train.max_pairs_per_epoch": 32,
    })

    commands = iter([
        "search echo",
        "popular",
        f"recommend {int(data.movie_ids[0])}",
        "recommend notanumber",
        "bogus",
        "quit",
    ])
    monkeypatch.setattr(builtins, "input", lambda *_: next(commands))

    class Args:
        pass

    rc = run_demo(cfg, Args())
    assert rc == 0
    out = capsys.readouterr().out
    assert "movies loaded" in out
    assert "recommendations:" in out
    assert "usage: recommend <movieId>" in out
    assert "commands:" in out  # menu reprinted on unknown command
