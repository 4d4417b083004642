"""Run logging: timestamped file+console logger, structured loss/eval
lines, exception capture.

Parity target: ``RAGraph_edge/utils/logger.py`` — ``Logger`` writing
``saved/<dataset>/<exp>/train_log_<time>.txt`` with argv/PID echo
(``:20-58``), ``log_loss``/``log_eval`` formatting (``:62-85``), and the
``log_exceptions`` decorator (``:10-17``).
"""

from __future__ import annotations

import datetime
import functools
import logging
import os
import sys


def log_exceptions(fn):
    """Log-and-reraise wrapper (``logger.py:10-17``)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception:
            logging.getLogger("ragraph_tpu").exception(
                "exception in %s", fn.__name__)
            raise

    return wrapper


class RunLogger:
    """File + console logger for a training run."""

    def __init__(self, save_dir: str | None = None, exp_name: str = "run",
                 echo_argv: bool = True):
        self.logger = logging.getLogger(f"ragraph_tpu.{exp_name}")
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        self.logger.propagate = False

        console = logging.StreamHandler(sys.stderr)
        console.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        self.logger.addHandler(console)

        self.log_path = None
        if save_dir is not None:
            stamp = datetime.datetime.now().strftime("%b-%d-%Y_%H-%M-%S")
            os.makedirs(save_dir, exist_ok=True)
            self.log_path = os.path.join(save_dir,
                                         f"train_log_{stamp}.txt")
            fh = logging.FileHandler(self.log_path)
            fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            self.logger.addHandler(fh)

        if echo_argv:
            self.log(f"PID: {os.getpid()}")
            self.log("CMD: python " + " ".join(sys.argv))
        # ps-visible process title (setproctitle, RAGraph_edge/pretrain.py:16)
        try:
            import setproctitle
            setproctitle.setproctitle(f"ragraph_tpu:{exp_name}")
        except ImportError:
            pass

    def __call__(self, msg):
        self.log(msg)

    def log(self, msg):
        self.logger.info(msg)

    def log_loss(self, epoch: int, loss_dict: dict):
        parts = " ".join(f"{k}={v:.5f}" if isinstance(v, float)
                         else f"{k}={v}" for k, v in loss_dict.items())
        self.log(f"[epoch {epoch}] {parts}")

    def log_eval(self, result: dict, ks):
        parts = []
        for metric, vals in result.items():
            if metric == "eval_time":
                parts.append(f"eval_time={vals}")
                continue
            for i, k in enumerate(ks):
                parts.append(f"{metric}@{k}={float(vals[i]):.5f}")
        self.log("[eval] " + " ".join(parts))
