"""Device-feeding input pipeline: background host loading + staged uploads.

The reference wires every training loop through worker-parallel, prefetching
torch DataLoaders (runner_base.py:578-655 DataLoader construction;
dataloader_utils.py:46-109 PrefetchLoader — a CUDA side-stream that uploads
batch i+1 while batch i computes). The TPU-native equivalent has two halves:

  * host parallelism = the multithreaded C++ libjpeg pool
    (native/loader.py CxrLoader): decode + resize + crop run in N worker
    threads off the Python thread entirely;
  * transfer/compute overlap = DevicePrefetcher below: a background thread
    pulls host batches and `jax.device_put`s them ahead of the step loop.
    JAX dispatch is async, so once the arrays are on device the train step
    launches with zero host wait — the analog of the CUDA side-stream,
    without streams (XLA orders the transfers).

`stage1_raw_batches` composes the two for the stage-1 trainer: Stage1Data
records -> CxrLoader (shuffled, pooled decode) -> tokenized caption join ->
fixed-shape batch dicts (static text padding so the jitted step never
retraces). Measured host rates: docs/PERF.md "Input pipeline".
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np


class DevicePrefetcher:
    """Iterate ``batches`` with device staging ``depth`` batches ahead.

    Wraps any iterator of pytrees (dicts/arrays). A daemon thread uploads
    upcoming batches with jax.device_put into a bounded queue; the consumer
    receives arrays that are already device-resident (or in flight — JAX
    transfers are async), so the step loop never blocks on host decode or
    the host->device copy. depth=2 double-buffers: one batch computing, one
    staging. Exceptions in the source iterator re-raise at the consumer.
    """

    _DONE = object()

    def __init__(self, batches: Iterable, depth: int = 2, device=None):
        self._src = batches
        self._device = device
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self) -> None:
        import jax
        try:
            for batch in self._src:
                if self._stop.is_set():
                    return
                staged = jax.device_put(batch, self._device)
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(self._DONE, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self) -> None:
        self._stop.set()
        # drain so the producer's blocked put can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __enter__(self) -> "DevicePrefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def pad_text_batch(ids_list, max_len: int, n_rows: Optional[int] = None):
    """Token-id lists -> fixed-shape (n, max_len) int32 ids + mask.

    STATIC max_len (not max-in-batch): a jitted train step compiles once per
    shape, so per-batch ragged padding would retrace every step."""
    n = n_rows if n_rows is not None else len(ids_list)
    text_ids = np.zeros((n, max_len), np.int32)
    text_mask = np.zeros((n, max_len), np.int32)
    for j, x in enumerate(ids_list):
        x = list(x)[:max_len]
        text_ids[j, :len(x)] = x
        text_mask[j, :len(x)] = 1
    return text_ids, text_mask


def stage1_raw_batches(data, tokenizer, max_txt_len: int, batch: int,
                       sub_epoch: int, resize: int = 512, crop: int = 448,
                       threads: int = 4, seed: int = 0,
                       drop_last: bool = True,
                       augment_fn: Optional[Callable] = None,
                       raw_u8: bool = True) -> Iterator[Dict]:
    """One sub-epoch of stage-1 raw-image batches through the native pool.

    data: Stage1Data (data/datasets.py — the MIMIC_CXR_Dataset contract,
    ReportDataset.py:210-371 incl. the custom-epoch subset scheme);
    tokenizer: callable(text, max_length=) -> {"input_ids"}. Yields
    {"images" (B,crop,crop,3) f32, "text_ids"/"text_mask" (B,max_txt_len)}
    with the images decoded+preprocessed by the C++ pool (PIL fallback
    inside CxrLoader when the native build is unavailable) and captions
    joined by the loader's shuffled indices.

    drop_last: the jitted step is shape-specialized; a ragged tail batch
    would compile a second executable (the reference's DataLoader also
    drops it, runner_base.py dataloader drop_last=True for train).

    raw_u8 (default): yield images as (B, crop, crop) uint8 — the exact
    PIL intermediate — and let the train step expand/normalize on device
    (make_stage1_raw_train_step handles the dtype; ops/image.expand_cxr_u8
    is bit-identical to the f32 path). 12x smaller host->device batches;
    measured decisive under the remote-TPU runtime (docs/PERF.md "Input
    pipeline"). Forced off when a HOST-side augment_fn is given (it
    expects the f32 form).
    """
    from ..native.loader import CxrLoader

    if augment_fn is not None:
        raw_u8 = False

    data.set_custom_epoch(sub_epoch)
    recs = [data[i] for i in range(len(data))]
    paths = [r["img_path"] for r in recs]
    # tokenize every caption ONCE up front (captions are fixed per epoch;
    # doing it per batch put wordpiece work on the step-loop thread between
    # loader next() calls — the one host core serves the decode pool, the
    # prefetcher's device_put and the dispatch loop simultaneously)
    tok_ids = [tokenizer(r["text_output"],
                         max_length=max_txt_len)["input_ids"] for r in recs]
    with CxrLoader(paths, batch=batch, resize=resize, crop=crop,
                   threads=threads, shuffle=True, seed=seed,
                   emit_u8=raw_u8) as ld:
        for images, idx in ld.epoch(seed=seed + sub_epoch):
            if drop_last and images.shape[0] < batch:
                continue
            text_ids, text_mask = pad_text_batch([tok_ids[i] for i in idx],
                                                 max_txt_len,
                                                 images.shape[0])
            if augment_fn is not None:
                images = augment_fn(images)
            yield {"images": images, "text_ids": text_ids,
                   "text_mask": text_mask}
