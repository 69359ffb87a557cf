"""CLI surface: enhance modes end-to-end on a real image; predict requires a
checkpoint; config round-trips through argparse without drift."""

import dataclasses
import os

import pytest

from retinex_tpu.config import Config, add_config_args, config_from_args

SRC = "/root/reference/data/input/102708607-003694-003694.jpg"


def test_config_argparse_roundtrip():
    import argparse

    parser = argparse.ArgumentParser()
    add_config_args(parser)
    args = parser.parse_args(
        ["--mode", "train", "--batch_size", "4", "--use_preact", "--lr", "0.001"]
    )
    cfg = config_from_args(args)
    assert cfg.mode == "train"
    assert cfg.batch_size == 4
    assert cfg.use_preact is True
    assert cfg.lr == 0.001
    # Every Config field is exposed as a flag — no drift possible.
    flag_names = {a.dest for a in parser._actions if a.dest != "help"}
    field_names = {f.name for f in dataclasses.fields(Config)}
    assert field_names <= flag_names


def test_cli_enhance_classical(tmp_path):
    from retinex_tpu.cli import main

    out = str(tmp_path / "out")
    main(
        [
            "--mode", "enhance",
            "--input_path", SRC,
            "--output_dir", out,
            "--max_size", "128",
            "--classical_mode", "msr",
        ]
    )
    assert os.path.exists(os.path.join(out, "102708607-003694-003694_enhanced.png"))


def test_cli_enhance_clahe_luma(tmp_path):
    """The fast luma-gain mode routes end-to-end without building the net."""
    from retinex_tpu.cli import main

    out = str(tmp_path / "out")
    main(
        [
            "--mode", "enhance",
            "--input_path", SRC,
            "--output_dir", out,
            "--max_size", "128",
            "--classical_mode", "clahe_luma",
        ]
    )
    assert os.path.exists(os.path.join(out, "102708607-003694-003694_enhanced.png"))


def test_cli_clahe_knobs_change_output(tmp_path):
    """--clahe_clip_limit / --clahe_tiles reach the standalone clahe modes."""
    import numpy as np
    from PIL import Image

    from retinex_tpu.cli import main

    outs = {}
    for tag, extra in (
        ("default", []),
        ("strong", ["--clahe_clip_limit", "6.0", "--clahe_tiles", "4"]),
    ):
        out = str(tmp_path / tag)
        main(
            ["--mode", "enhance", "--input_path", SRC, "--output_dir", out,
             "--max_size", "128", "--classical_mode", "clahe_luma"] + extra
        )
        outs[tag] = np.asarray(
            Image.open(os.path.join(out, "102708607-003694-003694_enhanced.png"))
        )
    assert not np.array_equal(outs["default"], outs["strong"])


def test_cli_enhance_untrained_net(tmp_path):
    from retinex_tpu.cli import main

    out = str(tmp_path / "out")
    main(
        [
            "--mode", "enhance",
            "--input_path", SRC,
            "--output_dir", out,
            "--max_size", "96",
            "--checkpoint", "",
            "--no-use_pallas_clahe",  # jnp CLAHE on the CPU test platform
        ]
    )
    assert os.path.exists(os.path.join(out, "102708607-003694-003694_comparison.png"))


def test_cli_predict_requires_checkpoint(tmp_path):
    from retinex_tpu.cli import main

    with pytest.raises(FileNotFoundError):
        main(
            [
                "--mode", "predict",
                "--input_path", SRC,
                "--output_dir", str(tmp_path),
                "--checkpoint", str(tmp_path / "missing"),
            ]
        )


def test_simple_enhance_cli(tmp_path):
    from retinex_tpu.cli import simple_enhance_main

    out = str(tmp_path / "out")
    simple_enhance_main(["--input", SRC, "--output", out, "--max_size", "96", "--classical", "ssr"])
    assert os.path.exists(os.path.join(out, "102708607-003694-003694_enhanced.png"))


def test_cli_enhance_packed_inference(tmp_path):
    from retinex_tpu.cli import main

    out = str(tmp_path / "out")
    main(
        [
            "--mode", "enhance",
            "--input_path", SRC,
            "--output_dir", out,
            "--max_size", "96",
            "--checkpoint", "",
            "--content_aware",
            "--packed_inference",
            "--no-use_pallas_clahe",
        ]
    )
    assert os.path.exists(os.path.join(out, "102708607-003694-003694_enhanced.png"))
