"""Scoped timing tree + logging.

TPU-native analog of plonky2's `TimingTree`/`timed!` (used throughout the
reference prover: prover.rs:86-92,144,191,202 and witness/traces.rs:268).
A thread-local tree of named scopes records wall time; `log` gates output
on the `ZKM_LOG` env var (error < warn < info < debug), defaulting to warn
so tests stay quiet.

Usage:
    from zkm_tpu.utils.timing import timed, log

    with timed("prove_segment"):
        with timed("trace commit", table="cpu"):
            ...
    log("info", "proved %d tables", n)

Scopes print at exit when ZKM_LOG >= info (nested, with durations), and
are always accumulated into `TimingTree.current()` so drivers can report
totals without any env var.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from contextlib import contextmanager
from typing import List, Optional

_LEVELS = {"error": 0, "warn": 1, "info": 2, "debug": 3}


def _env_level() -> int:
    return _LEVELS.get(os.environ.get("ZKM_LOG", "warn").lower(), 1)


def log(level: str, fmt: str, *args) -> None:
    """Leveled stderr logging (reference: log/env_logger via RUST_LOG)."""
    if _LEVELS[level] <= _env_level():
        msg = fmt % args if args else fmt
        print(f"[zkm:{level}] {msg}", file=sys.stderr, flush=True)


class Scope:
    __slots__ = ("name", "detail", "start", "duration", "children")

    def __init__(self, name: str, detail: str):
        self.name = name
        self.detail = detail
        self.start = time.monotonic()
        self.duration = 0.0
        self.children: List[Scope] = []

    def label(self) -> str:
        return f"{self.name} [{self.detail}]" if self.detail else self.name

    def render(self, indent: int = 0, min_seconds: float = 0.0) -> List[str]:
        lines = []
        if self.duration >= min_seconds:
            lines.append(f"{'  ' * indent}{self.duration:8.3f}s "
                         f"{self.label()}")
            for c in self.children:
                lines.extend(c.render(indent + 1, min_seconds))
        return lines


class TimingTree(threading.local):
    """Thread-local stack of open scopes; root holds finished trees."""

    def __init__(self):
        self.stack: List[Scope] = []
        self.finished: List[Scope] = []

    def open(self, name: str, detail: str) -> Scope:
        s = Scope(name, detail)
        if self.stack:
            self.stack[-1].children.append(s)
        self.stack.append(s)
        return s

    def close(self, s: Scope) -> None:
        s.duration = time.monotonic() - s.start
        assert self.stack and self.stack[-1] is s
        self.stack.pop()
        if _env_level() >= _LEVELS["info"] and s.duration >= 0.005:
            # stream each scope as it closes (children already printed)
            print(f"[zkm:time] {'  ' * len(self.stack)}"
                  f"{s.duration:8.3f}s {s.label()}",
                  file=sys.stderr, flush=True)
        if not self.stack:
            self.finished.append(s)

    def pop_finished(self) -> List[Scope]:
        out, self.finished = self.finished, []
        return out


_TREE = TimingTree()


def current() -> TimingTree:
    return _TREE


@contextmanager
def timed(name: str, **detail):
    """Scoped timer; kwargs render as `k=v` detail."""
    d = " ".join(f"{k}={v}" for k, v in detail.items())
    s = _TREE.open(name, d)
    try:
        yield s
    finally:
        _TREE.close(s)


def timed_fn(name: Optional[str] = None):
    """Decorator form of `timed`."""
    def deco(fn):
        label = name or fn.__qualname__

        def wrapped(*args, **kwargs):
            with timed(label):
                return fn(*args, **kwargs)
        wrapped.__name__ = fn.__name__
        wrapped.__qualname__ = fn.__qualname__
        wrapped.__doc__ = fn.__doc__
        return wrapped
    return deco
