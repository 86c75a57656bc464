"""``python -m dffx`` — one front door to every CLI in the framework.

The reference scatters its entry points over seven scripts in three
directories (``Depth_Estimation_Test/test.py``, ``test_real_scenes.py``, five
``train_codes/train_code_*.py``, ``synthetic_data_generation/``); dffx folds
them behind subcommands (the direct module paths and the ``pyproject.toml``
console scripts keep working — this is sugar, not a new layer):

    python -m dffx eval --dataset DDFF ...      # dffx.eval.test
    python -m dffx real-scenes ...              # dffx.eval.real_scenes
    python -m dffx train --recipe DDFF ...      # dffx.train.cli
    python -m dffx simulate ...                 # dffx.sim.simulator
    python -m dffx doctor                       # environment report
    python -m dffx --version

Dispatch imports the chosen subcommand lazily so ``doctor`` can still run
(and report) when an optional dependency of another subcommand is broken.
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "eval": ("dffx.eval.test", "benchmark-dataset evaluation (reference test.py)"),
    "real-scenes": ("dffx.eval.real_scenes", "E2E alignment+depth on real captures"),
    "train": ("dffx.train.cli", "training driver (all five recipes + Simulated)"),
    "simulate": ("dffx.sim.simulator", "thin-lens focal-stack simulator (NYU-v2)"),
    "doctor": ("dffx.utils.doctor", "environment / install health report"),
}


def _usage() -> str:
    import dffx

    lines = [f"dffx {dffx.__version__} — TPU-native depth from focus", "",
             "usage: python -m dffx <command> [args...]", "", "commands:"]
    for name, (_, help_) in _COMMANDS.items():
        lines.append(f"  {name:<12} {help_}")
    lines.append("")
    lines.append("`python -m dffx <command> --help` shows that command's flags.")
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return 0
    if argv[0] in ("--version", "version"):
        import dffx

        print(f"dffx {dffx.__version__}")
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in _COMMANDS:
        print(f"unknown command: {cmd!r}\n\n{_usage()}", file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(_COMMANDS[cmd][0])
    rc = mod.main(rest)
    return 0 if rc is None else int(rc)


if __name__ == "__main__":
    raise SystemExit(main())
