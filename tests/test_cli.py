"""CLI tests: argument surface + an end-to-end offline render to PNG."""

import numpy as np
import pytest

from raytracer_tpu.app import io
from raytracer_tpu.app.cli import build_parser, main


def test_parser_defaults():
    args = build_parser().parse_args([])
    assert args.config == "demo"
    assert args.backend == "auto"
    assert args.progressive_frames == 0
    assert args.aov is None


def test_parser_rejects_bad_config(capsys):
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--config", "bogus"])


def test_cli_offline_render(tmp_path, capsys):
    out = str(tmp_path / "r.png")
    rc = main([
        "--config", "two_sphere", "--width", "64", "--height", "36",
        "--spp", "2", "--max-depth", "4", "--backend", "jnp", "--out", out,
    ])
    assert rc == 0
    img = io.decode_png(open(out, "rb").read())
    assert img.shape == (36, 64, 3)
    msg = capsys.readouterr().out
    assert "Mrays/s" in msg


def test_cli_progressive_render(tmp_path):
    out = str(tmp_path / "p.png")
    rc = main([
        "--config", "two_sphere", "--width", "48", "--height", "27",
        "--max-depth", "3", "--backend", "jnp",
        "--progressive-frames", "3", "--out", out,
    ])
    assert rc == 0
    assert io.decode_png(open(out, "rb").read()).shape == (27, 48, 3)


def test_cli_aov_render(tmp_path):
    out = str(tmp_path / "n.png")
    rc = main([
        "--config", "two_sphere", "--width", "48", "--height", "27",
        "--aov", "normal", "--out", out,
    ])
    assert rc == 0
    img = io.decode_png(open(out, "rb").read())
    assert img.shape == (27, 48, 3)


def test_cli_book_physics(tmp_path):
    out_a = str(tmp_path / "a.png")
    out_b = str(tmp_path / "b.png")
    base = ["--config", "two_sphere", "--width", "48", "--height", "27",
            "--spp", "2", "--max-depth", "1", "--backend", "jnp"]
    main(base + ["--out", out_a])
    main(base + ["--book-physics", "--out", out_b])
    a = io.decode_png(open(out_a, "rb").read())
    b = io.decode_png(open(out_b, "rb").read())
    # depth-1 exhaustion: reference keeps throughput, book goes black
    assert a.astype(int).sum() > b.astype(int).sum()


def test_cli_adaptive_spp_map(tmp_path, monkeypatch):
    """--spp-map saves the adaptive sample-density heatmap next to the
    render (forced multi-chunk schedule so early termination engages at
    test scale)."""
    from raytracer_tpu.render import pallas_kernel as pk

    monkeypatch.setattr(pk, "_pick_chunk_spp",
                        lambda spp, *a, **k: min(spp, 3))
    monkeypatch.setattr(pk, "ADAPTIVE_MIN_N", 4)
    out, mp = str(tmp_path / "r.png"), str(tmp_path / "m.png")
    rc = main([
        "--config", "two_sphere", "--width", "128", "--height", "32",
        "--spp", "27", "--max-depth", "4", "--backend", "pallas",
        "--adaptive", "0.05", "--spp-map", mp, "--out", out,
    ])
    assert rc == 0
    heat = io.decode_png(open(mp, "rb").read())
    assert heat.shape == (32, 128, 3)
    assert heat.max() == 255  # normalized to the busiest pixel
    assert heat.min() < heat.max()  # density actually varies


def test_cli_spp_map_warns_without_adaptive(tmp_path, capsys):
    out, mp = str(tmp_path / "r.png"), str(tmp_path / "m.png")
    rc = main([
        "--config", "two_sphere", "--width", "48", "--height", "27",
        "--spp", "2", "--max-depth", "3", "--backend", "jnp",
        "--spp-map", mp, "--out", out,
    ])
    assert rc == 0
    assert "spp-map" in capsys.readouterr().err
    import os

    assert not os.path.exists(mp)


def test_cli_stratified_sampler(tmp_path):
    """--sampler stratified plumbs through to a different (but valid)
    render than the random default."""
    a, b = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    base = ["--config", "two_sphere", "--width", "64", "--height", "36",
            "--spp", "4", "--max-depth", "4", "--backend", "jnp"]
    assert main(base + ["--sampler", "stratified", "--out", a]) == 0
    assert main(base + ["--out", b]) == 0
    ia = io.decode_png(open(a, "rb").read()).astype(np.float32)
    ib = io.decode_png(open(b, "rb").read()).astype(np.float32)
    assert not np.array_equal(ia, ib)  # different sample sequences
    assert np.abs(ia - ib).mean() / 255.0 < 0.05  # same image to noise
