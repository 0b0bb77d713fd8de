"""CLI surface smoke tests (tiny configs; mirrors the reference's argparse
entry points, SURVEY.md §5 config/flag system)."""

import numpy as np
import pytest

from fhe_spear_tpu.__main__ import main


def test_cli_retrieval(capsys):
    main(["retrieval", "--n_docs", "12", "--mode", "row"])
    out = capsys.readouterr().out
    assert "encrypted top-1 matches plaintext" in out


def test_cli_generate(capsys):
    main(["generate", "--d", "32", "--f", "64", "--blocks", "1",
          "--tokens", "1", "--n", "256", "--head_size", "16"])
    out = capsys.readouterr().out
    assert "1/1 tokens match plaintext" in out


def test_cli_fullenc(capsys):
    main(["fullenc", "--d", "16", "--f", "32", "--blocks", "2",
          "--l0", "8", "--n", "256"])
    out = capsys.readouterr().out
    assert "2 blocks" in out and "final corr" in out


def test_cli_access_control(capsys):
    main(["access-control", "--n_docs", "10", "--dim", "8", "--n", "256"])
    out = capsys.readouterr().out
    assert "alice top: 0" in out
