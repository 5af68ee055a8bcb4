"""Metric logging: JSONL file + stdout, with wandb when available.

Same metric names as the reference's tracker (loss, total_norm, lr, save_loss,
reference trainer.py:321-334); wandb is optional (gated import) and the JSONL
stream is always written so runs are inspectable offline.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


try:
    import wandb  # noqa: F401

    _HAS_WANDB = True
except Exception:  # pragma: no cover - wandb not installed in this env
    _HAS_WANDB = False


class MetricLogger:
    def __init__(
        self,
        project_dir: Path,
        project_name: str = "OsuFusion",
        use_wandb: bool = True,
        enabled: bool = True,
    ) -> None:
        """``enabled=False`` makes every method a no-op — the non-main
        processes of a multi-host run (reference trainer.py:321 gates the
        tracker to `is_main_process`)."""
        self.enabled = enabled
        self.wandb_run = None
        self.file = None
        if not enabled:
            return
        self.project_dir = Path(project_dir)
        self.project_dir.mkdir(parents=True, exist_ok=True)
        self.file = open(self.project_dir / "metrics.jsonl", "a", buffering=1)
        if use_wandb and _HAS_WANDB:
            try:
                self.wandb_run = wandb.init(project=project_name, dir=str(self.project_dir))
            except Exception:
                self.wandb_run = None

    def log(self, metrics: dict, step: int) -> None:
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in metrics.items()}}
        self.file.write(json.dumps(rec) + "\n")
        if self.wandb_run is not None:
            self.wandb_run.log(metrics, step=step)

    def log_image(self, name: str, path: Path, step: int) -> None:
        if self.wandb_run is not None:
            self.wandb_run.log({name: wandb.Image(str(path))}, step=step)

    def close(self) -> None:
        if self.file is not None:
            self.file.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()
