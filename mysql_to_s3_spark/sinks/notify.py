"""Batch-completion notification (reference mysql_to_s3/extract.py:244-251
posts to SQS via aws.Queue; vendor/pyLibrary/aws/__init__.py).

The payload shape is kept verbatim; the transport is pluggable:

  FileQueue    JSON-lines append file — the local/test stand-in.
  CallbackQueue forwards to any callable (wire boto3's sqs.send_message
               here in a real deployment; boto3 is not in this container).

Notification volume is one message per batch key — driver-side by design
(the reference's loop does the same); nothing here touches row data.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable


def notify_payload(bucket: str, key: str, now: float | None = None) -> dict:
    """The reference's SQS message shape (extract.py:246-251)."""
    ts = time.time() if now is None else float(now)
    return {
        "bucket": bucket,
        "key": key,
        "timestamp": ts,
        "date/time": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(ts)),
    }


class FileQueue:
    """JSON-lines append-only queue file (SQS stand-in for tests/local)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def add(self, message: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(message, sort_keys=True) + "\n")

    def messages(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]


class CallbackQueue:
    def __init__(self, fn: Callable[[dict], Any]):
        self.fn = fn

    def add(self, message: dict) -> None:
        self.fn(message)
