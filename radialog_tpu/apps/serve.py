"""Multi-session serving front-end over continuous batching.

The reference serves ONE conversation at a time (demo.py — each generate()
call owns the GPU, so a second user waits for the first user's whole
report). This wraps `decode/continuous.RingBatcher` in a thread-safe
server: any number of client threads submit requests; a single stepper
thread owns the batcher (and therefore the TPU), admitting requests into
free lanes at chunk granularity and resolving per-request futures as
sessions finish. Measured capacity on one v5e chip at Vicuna-7B shapes:
666 aggregate tok/s at 32 lanes (docs/PERF.md) vs the reference demo's
~8–12 tok/s for its single user.

Design:
  * The RingBatcher is NOT thread-safe and JAX dispatch should come from
    one thread — ALL batcher interaction happens on the stepper thread.
    `submit()` only enqueues; results come back through a
    `concurrent.futures.Future[List[int]]`.
  * Per-request errors (oversized prompt, max_new_tokens >= ring) are
    delivered to THAT request's future via set_exception — one bad client
    never takes down the loop. An error in the shared decode step is fatal
    for the in-flight sessions: it fails every outstanding future and
    marks the server dead (subsequent submit() raises).
  * The stepper idles on a condition variable when there is no work — an
    idle server burns no TPU cycles.
  * Works with both serving weight layouts (unrolled int8/int4 and stacked
    bf16) — the ring design is layout-agnostic.
"""
from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Dict, List, Optional

from ..decode.continuous import RingBatcher
from ..decode.engine import DecodeParams
from ..models.llama import LlamaConfig
from ..ops.layers import DTypePolicy, FP32


class RaDialogServer:
    """Thread-safe continuous-batching server over one decode loop.

    >>> srv = RaDialogServer(params, cfg, lanes=8)
    >>> fut = srv.submit(prompt_ids, img_embs=embs)
    >>> tokens = fut.result()          # blocks until the session finishes
    >>> srv.shutdown()
    """

    def __init__(self, params: Optional[Dict] = None,
                 cfg: Optional[LlamaConfig] = None, lanes: int = 8,
                 cache_len: int = 512, prompt_len: int = 256,
                 dp: DecodeParams = DecodeParams(),
                 lora: Optional[Dict] = None, policy: DTypePolicy = FP32,
                 steps_per_call: int = 8, donate_cache: bool = True,
                 batcher: Optional[RingBatcher] = None,
                 kv_int8: bool = False):
        # ``batcher``: serve a pre-built scheduler instead — e.g. the
        # TP-sharded parallel/tp_ring.TPRingBatcher, or the batched
        # speculative decode/spec_ring.SpecRingBatcher for correction/QA-
        # heavy workloads (same host interface; tests/test_serve.py pins
        # the composition); mutually exclusive with params/cfg.
        if batcher is not None:
            if params is not None or cfg is not None:
                raise ValueError("pass either batcher= or params+cfg, not both")
            self._rb = batcher
        elif params is None or cfg is None:
            raise ValueError("params and cfg are required without batcher=")
        else:
            self._rb = RingBatcher(params, cfg, lanes=lanes,
                                   cache_len=cache_len,
                                   prompt_len=prompt_len, dp=dp, lora=lora,
                                   policy=policy,
                                   steps_per_call=steps_per_call,
                                   donate_cache=donate_cache,
                                   kv_int8=kv_int8)
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._pending: List[tuple] = []  # (fut, prompt, img, max_new, on_tok)
        self._futures: Dict[int, Future] = {}
        self._streams: Dict[int, tuple] = {}   # sid -> (Session, cb, n_sent)
        self._stop = False
        self._dead: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, name="radialog-serve",
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- clients
    def submit(self, prompt_ids: List[int], img_embs=None,
               max_new_tokens: Optional[int] = None,
               on_tokens=None) -> "Future[List[int]]":
        """Queue a request from any thread; returns its future.

        on_tokens: optional ``callable(new_tokens: List[int], done: bool)``
        STREAMING hook — invoked on the server thread after every decode
        chunk with that session's freshly generated tokens (granularity =
        ``steps_per_call``; the reference demo streams characters,
        demo.py:349-366 — here the token deltas stream while the batch
        keeps decoding). The final invocation has ``done=True`` (possibly
        with an empty delta). Keep it fast and non-blocking: it runs on
        the shared stepper thread; push to a queue for slow consumers."""
        fut: Future = Future()
        with self._work:
            if self._stop:
                raise RuntimeError("server is shut down")
            if self._dead is not None:
                raise RuntimeError("server died") from self._dead
            self._pending.append((fut, list(prompt_ids), img_embs,
                                  max_new_tokens, on_tokens))
            self._work.notify()
        return fut

    def generate(self, prompt_ids: List[int], img_embs=None,
                 max_new_tokens: Optional[int] = None,
                 timeout: Optional[float] = None) -> List[int]:
        """Blocking convenience wrapper."""
        return self.submit(prompt_ids, img_embs, max_new_tokens).result(timeout)

    def warmup(self, prompt_buckets=(32,), token_id: int = 0,
               timeout: Optional[float] = None) -> float:
        """Precompile the serving executables BEFORE the first real request.

        Boot-time ops concern (docs/PERF.md "Cold start"): the first
        request of a fresh process otherwise pays the decode-step + prefill
        compiles (minutes cold, seconds with `.jax_cache/` populated)
        inside its own latency. One throwaway session per prompt bucket
        compiles the shared step_fn once and prefill_fn per 32-token
        bucket; the ring lanes it used are freed when the session
        finishes. Returns seconds spent (= the compile wall moved out of
        the first user's request)."""
        import time
        t0 = time.time()
        chunk = getattr(self._rb, "steps_per_call", 1)
        futs = [self.submit([token_id] * max(1, int(b)),
                            max_new_tokens=chunk)
                for b in prompt_buckets]
        for f in futs:
            f.result(timeout)
        return time.time() - t0

    def shutdown(self, timeout: float = 60.0) -> None:
        """Finish in-flight sessions, then stop the stepper."""
        with self._work:
            self._stop = True
            self._work.notify()
        self._thread.join(timeout)

    # ------------------------------------------------------------- stepper
    def _admit_pending(self, pending) -> None:
        rb = self._rb
        for fut, prompt, img, max_new, on_tokens in pending:
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                # validate HERE: rb.submit only queues; _admit's raise
                # inside rb.step() would take down the shared loop
                rb.validate_request(len(prompt), max_new)
                sid = rb.submit(prompt, img_embs=img, max_new_tokens=max_new)
            except Exception as exc:  # per-request validation error
                fut.set_exception(exc)
                continue
            self._futures[sid] = fut
            if on_tokens is not None:
                # the Session object just enqueued by rb.submit — its
                # .tokens list grows in place as the batcher decodes
                self._streams[sid] = (rb.queue[-1], on_tokens, 0)

    def _pump_streams(self, final: bool = False) -> None:
        for sid in list(self._streams):
            sess, cb, sent = self._streams[sid]
            done = sess.done or final
            delta = sess.tokens[sent:]
            if delta or done:
                try:
                    cb(list(delta), done)
                except Exception:
                    # a client callback must not damage the shared loop —
                    # but the submit() contract promises a final done=True
                    # invocation, so attempt exactly one before dropping
                    # the stream (a consumer that closes its queue only on
                    # done=True would otherwise wait forever)
                    if not done:
                        done = True
                        try:
                            cb([], True)
                        except Exception:
                            pass
            if done:
                del self._streams[sid]
            else:
                self._streams[sid] = (sess, cb, sent + len(delta))

    def _resolve_finished(self) -> None:
        rb = self._rb
        self._pump_streams()
        for sid in [s for s in self._futures if s in rb.finished]:
            # pop from rb.finished too: retaining every Session (tokens +
            # img_embs device array) would grow memory forever
            self._futures.pop(sid).set_result(rb.finished.pop(sid).tokens)

    def _run(self) -> None:
        rb = self._rb
        while True:
            with self._work:
                while (not self._pending and not rb.queue
                       and rb.active_lanes == 0 and not self._stop):
                    self._work.wait()
                if (self._stop and not self._pending and not rb.queue
                        and rb.active_lanes == 0):
                    return
                pending, self._pending = self._pending, []
            self._admit_pending(pending)
            try:
                rb.step()       # requests were pre-validated, so an error
            except Exception as exc:  # here is shared-state damage: fatal
                with self._work:
                    # drain _pending under the SAME lock that sets _dead:
                    # a submit() racing this block either lands in the
                    # drained list (failed below) or sees _dead and raises
                    # — never a forever-pending future
                    self._dead = exc
                    pending, self._pending = self._pending, []
                for fut in self._futures.values():
                    fut.set_exception(exc)
                self._futures.clear()
                for fut, *_ in pending:
                    if fut.set_running_or_notify_cancel():
                        fut.set_exception(exc)
                self._pump_streams(final=True)
                return
            # resolve via rb.finished, not step()'s return value: a session
            # can also finish at ADMISSION (EOS as its first token), which
            # step()'s newly-finished list does not include
            self._resolve_finished()
