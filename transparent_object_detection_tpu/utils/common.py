"""Shared utility belt (reference: utils/utils.py:9-77)."""
from __future__ import annotations

import random
from typing import List, Tuple

import numpy as np


def get_classes(classes_path: str) -> Tuple[List[str], int]:
    """Read one class name per line (reference utils/utils.py:32-41)."""
    with open(classes_path, encoding="utf-8") as f:
        class_names = [c.strip() for c in f.readlines() if c.strip()]
    return class_names, len(class_names)


def seed_everything(seed: int = 11) -> np.random.Generator:
    """Seed host-side RNGs and return a numpy Generator for the data pipeline.

    Device-side randomness in this framework flows through explicit
    jax.random keys, so unlike the reference (utils/utils.py:48-56) there is
    no global device RNG state to pin — seeding host RNGs plus threading PRNG
    keys gives full determinism.
    """
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


def show_config(**kwargs) -> str:
    """Format + print a config table (reference utils/utils.py:69-77)."""
    lines = ["Configurations:", "-" * 70, "|%25s | %40s|" % ("keys", "values"), "-" * 70]
    for key, value in kwargs.items():
        lines.append("|%25s | %40s|" % (str(key), str(value)))
    lines.append("-" * 70)
    text = "\n".join(lines)
    print(text)
    return text


def preprocess_input(image: np.ndarray) -> np.ndarray:
    """Scale uint8 pixels to [0, 1] (reference utils/utils.py:66-67)."""
    return image / 255.0
