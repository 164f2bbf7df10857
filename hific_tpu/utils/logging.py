"""Experiment logging: console + JSONL + optional TensorBoard.

Replaces the reference's logging/TensorBoard stack (src/helpers/utils.py:
266-380): scalars are appended to `metrics.jsonl` (the pickle-storage
equivalent, greppable) and mirrored to tf.summary event files when
TensorFlow is importable.
"""

import json
import logging
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Optional


def setup_logger(log_dir: Optional[str] = None, name: str = "hific_tpu"):
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricWriter:
    """Scalar sink: JSONL always; TensorBoard when available."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # noqa: F401

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None
        self.storage = defaultdict(list)  # in-memory mirror, like the
        # reference's storage defaultdicts (model.py:107-116)

    def write(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            record[key] = float(v)
            self.storage[key].append(float(v))
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"{prefix}{k}", float(v), step=int(step))
                self._tb.flush()

    def write_images(self, step: int, images: Dict[str, "object"],
                     max_images: int = 4):
        """Log NHWC [0,1] image batches to TensorBoard (the reference's
        reconstruction grids, utils.py:376-380). No-op without TF."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        with self._tb.as_default():
            for name, batch in images.items():
                arr = np.clip(np.asarray(batch)[:max_images], 0.0, 1.0)
                tf.summary.image(name, arr, step=int(step),
                                 max_outputs=max_images)
            self._tb.flush()

    def close(self):
        self._jsonl.close()


def save_side_by_side(path: str, inputs, recons, max_images: int = 4):
    """On-disk input|reconstruction comparison PNG (one row per image),
    matching the reference's per-eval reconstruction dumps
    (train.py:61-79, utils.save_images utils.py:376-380).

    inputs/recons: NHWC float batches in [0,1]."""
    import numpy as np
    from PIL import Image

    x = np.clip(np.asarray(inputs)[:max_images], 0.0, 1.0)
    r = np.clip(np.asarray(recons)[:max_images], 0.0, 1.0)
    rows = [np.concatenate([xi, ri], axis=1) for xi, ri in zip(x, r)]
    grid = np.concatenate(rows, axis=0)
    arr = (grid * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path
