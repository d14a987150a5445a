"""Typed action log — the Spark port of the reference's test observability
harness (MockEnvironment.scala:46-91, Action enum :50-60). Production runs
use it for metrics plumbing; tests assert exact ordered sequences, with
UUID-bearing paths normalized (MockEnvironment.scala:128-130)."""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Action:
    kind: str  # WroteFile | SentToBad | AddedCountMetric | SetE2ELatencyMetric | Checkpointed
    detail: tuple = ()


_UUID_RE = re.compile(
    r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}|(?<=-)\d{4}(?=\.gz)"
)


def normalize_uuid(path: str) -> str:
    return _UUID_RE.sub("xxxx", path)


@dataclass
class ActionLog:
    actions: list[Action] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record(self, kind: str, *detail) -> None:
        with self._lock:
            self.actions.append(Action(kind, tuple(detail)))

    def kinds(self) -> list[str]:
        return [a.kind for a in self.actions]

    def of_kind(self, kind: str) -> list[Action]:
        return [a for a in self.actions if a.kind == kind]
