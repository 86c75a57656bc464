"""dffx.train — data-parallel training over a TPU mesh.

Replaces the reference's five copy-pasted ``train_code_*.py`` scripts with one
jitted train step (`dffx.train.loop`) parameterized by per-dataset recipes
(`dffx.train.recipes`) that preserve every constant and normalization quirk of
the originals (SURVEY.md §2.3).
"""

from dffx.train.loop import (
    TrainState,
    LossConfig,
    create_train_state,
    make_eval_fn,
    make_train_step,
    masked_mse,
)

__all__ = [
    "TrainState",
    "LossConfig",
    "create_train_state",
    "make_train_step",
    "make_eval_fn",
    "masked_mse",
]
