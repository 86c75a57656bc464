"""The ``python -m dffx`` umbrella CLI and the ``doctor`` environment report.

The reference has seven scattered entry scripts and no install diagnostics;
these tests pin the one front door: dispatch to every real subcommand, exit
codes, and that doctor's core rows are healthy in the test environment.
"""

import subprocess
import sys

import pytest

from dffx.__main__ import main as umbrella
from dffx.utils import doctor


def test_version_and_usage_exit_zero(capsys):
    assert umbrella(["--version"]) == 0
    assert "dffx 0." in capsys.readouterr().out
    assert umbrella([]) == 0
    out = capsys.readouterr().out
    for cmd in ("eval", "real-scenes", "train", "simulate", "doctor"):
        assert cmd in out


def test_unknown_command_exits_two(capsys):
    assert umbrella(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().err


@pytest.mark.parametrize("cmd", ["eval", "real-scenes", "train", "simulate"])
def test_dispatch_reaches_real_subcommand_parser(cmd):
    # argparse --help exits 0 from *inside* the dispatched module's parser —
    # proving the lazy import + main(rest) handoff reaches the real CLI.
    with pytest.raises(SystemExit) as e:
        umbrella([cmd, "--help"])
    assert e.value.code == 0


def test_doctor_core_rows_healthy(capsys):
    assert umbrella(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "environment healthy" in out
    rows = {name: status for name, status, _ in doctor.collect()}
    for core in ("dffx", "jax", "optax", "numpy", "exr codec"):
        assert rows[core] == doctor.OK, (core, rows)


def test_module_execution_entry():
    # `python -m dffx doctor` as a user would actually type it.
    proc = subprocess.run(
        [sys.executable, "-m", "dffx", "doctor"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "doctor: environment healthy" in proc.stdout
