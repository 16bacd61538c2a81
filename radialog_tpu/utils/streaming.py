"""Streaming generation helpers (reference utils/callbacks.py:15-75:
StoppingCriteria-based token callback + callback->generator adapter).

TPU-native equivalent: the decode loop stays fully on-device; streaming
happens by chunking — decode N tokens per device roundtrip and yield each
chunk's text. (A per-token host callback would serialize the device against
the host, the exact pattern the jitted while_loop exists to avoid.)
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np


def stream_chunks(session, dp, chunk_size: int = 16,
                  max_new_tokens: int = 300) -> Iterator[List[int]]:
    """Yield generated token-id chunks from a decode/session.InteractiveSession.

    Each chunk is one jitted decode of up to ``chunk_size`` tokens; the KV
    cache persists between chunks so total work matches a single long decode.
    """
    import dataclasses
    produced = 0
    while produced < max_new_tokens:
        n = min(chunk_size, max_new_tokens - produced,
                max(1, session.remaining - 1))
        ids = session.generate(dataclasses.replace(dp, max_new_tokens=n))
        if not ids:
            return
        yield ids
        produced += len(ids)
        if ids[-1] == dp.eos_token_id:
            return
        # re-arm the session's logits for the next chunk: feed the pending
        # tail (the last generated token) back through an incremental prefill
        session.append_tokens([])
        if session._last_logits is None:
            return


class Iteratorize:
    """Adapter: a callback-style producer -> a blocking generator
    (utils/callbacks.py:37-75). Runs ``func(callback=...)`` on a thread and
    yields everything passed to the callback."""

    _SENTINEL = object()

    def __init__(self, func: Callable, timeout: Optional[float] = None):
        self.q: "queue.Queue" = queue.Queue()
        self.timeout = timeout

        def _run():
            try:
                func(callback=self.q.put)
            finally:
                self.q.put(self._SENTINEL)

        self.thread = threading.Thread(target=_run, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get(timeout=self.timeout)
        if item is self._SENTINEL:
            raise StopIteration
        return item
