"""Offline Comet experiment archives — the `comet_logging` flag's artifact.

The reference optionally attaches a Lightning CometLogger pointed at an
offline directory (/root/reference/src/PLTrainer.py:365-374,
params_HyperPRI.py:81-87): each run leaves a `<experiment_key>.zip` archive
that `comet upload` can later push to the service. hyperpri_tpu never
contacts any external service; when `cfg.comet_logging` is set this writer
produces the equivalent LOCAL artifact so the workflow (train offline,
upload archives later, or just archive them) is preserved.

Archive layout mirrors comet-ml 3.x offline experiments structurally:

    <experiment_key>.zip
      experiment.json   — metadata: key, workspace/project, start/stop times
      messages.json     — one JSON message per line:
                            {"type": "metric_msg", "payload": {"metric":
                              {"metricName", "metricValue", "step", "epoch",
                               "timestamp"}}}
                            {"type": "parameter_msg", "payload": {"param":
                              {"paramName", "paramValue"}}}

This is a best-effort structural mirror written from the public archive
format (no Comet SDK exists in this environment to validate an upload
round-trip); the unit tests pin the structure. Everything in the archive is
ALSO in LOGS/metrics.csv, LOGS/events.jsonl and the TB event files — the
archive adds no information, only the Comet-shaped container.
"""

from __future__ import annotations

import json
import os
import time
import uuid
import zipfile
from typing import Any, Dict, Optional


class CometOfflineWriter:
    """Accumulates metric/parameter messages; `close()` writes the zip."""

    def __init__(self, offline_dir: str, project_name: str = "hyperpri",
                 workspace: str = "offline", experiment_name: Optional[str] = None):
        self.offline_dir = offline_dir
        self.experiment_key = uuid.uuid4().hex
        self.meta = {
            "offline_id": self.experiment_key,
            "experiment_key": self.experiment_key,
            "experiment_name": experiment_name,
            "workspace": workspace,
            "project_name": project_name,
            "start_time": int(time.time() * 1000),
            "stop_time": None,
            "mode": "create",
            "writer": "hyperpri_tpu.utils.comet_offline",
        }
        self._messages = []
        self._closed = False

    # -- logging -----------------------------------------------------------

    def log_parameters(self, params: Dict[str, Any]) -> None:
        for k, v in params.items():
            try:
                json.dumps(v)
            except (TypeError, ValueError):
                v = str(v)
            self._messages.append(
                {"type": "parameter_msg",
                 "payload": {"param": {"paramName": str(k), "paramValue": v}}}
            )

    def log_metrics(self, metrics: Dict[str, Any], step: int,
                    epoch: Optional[int] = None) -> None:
        ts = int(time.time() * 1000)
        for k, v in metrics.items():
            if not isinstance(v, (int, float)):
                continue
            self._messages.append(
                {"type": "metric_msg",
                 "payload": {"metric": {
                     "metricName": str(k), "metricValue": float(v),
                     "step": int(step),
                     "epoch": int(epoch) if epoch is not None else int(step),
                     "timestamp": ts,
                 }}}
            )

    # -- archive -----------------------------------------------------------

    def close(self) -> str:
        """Write `<experiment_key>.zip`; returns the archive path.
        Idempotent — later calls rewrite the same archive."""
        os.makedirs(self.offline_dir, exist_ok=True)
        self.meta["stop_time"] = int(time.time() * 1000)
        path = os.path.join(self.offline_dir, f"{self.experiment_key}.zip")
        tmp = path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("experiment.json", json.dumps(self.meta, indent=2))
            z.writestr(
                "messages.json",
                "".join(json.dumps(m) + "\n" for m in self._messages),
            )
        os.replace(tmp, path)
        self._closed = True
        return path
