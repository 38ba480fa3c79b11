"""NovaRecords: packed feature records + prefetching loader.

Capability parity with the reference data stack (`diffnext/data/`):
- codewithgpu DatasetReader -> NovaRecords format (data.bin + index.bin),
  read via the native C++ mmap reader (native/nova_records.cc, built on
  demand) with a pure-numpy fallback
- FeatureDataLoader's multiprocess prefetch + BalancedQueues
  (`flex_loaders.py:30-165`) -> a double-buffered background-thread batcher
  with native page readahead (decode here is numpy-light, so threads + mmap
  beat fork+pickle)
- ParseLatents/ParseAnnotations (`flex_transforms.py:31-66`): records carry
  fp16 VAE "moments", caption embeds or text, labels, motion_flow
- per-host sharding keyed on jax.process_index() (replaces
  accelerate_utils.get_ddp_shards)

Record encoding: TLV fields — name_len:u8, name, dtype_code:u8, ndim:u8,
dims:u32[ndim], payload. dtype codes index DTYPES below.
"""

import ctypes
import json
import os
import queue
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

DTYPES = [np.float32, np.float16, np.int32, np.int64, np.uint8, np.bool_]
_DTYPE_CODE = {np.dtype(d): i for i, d in enumerate(DTYPES)}
_BYTES_CODE = 255  # raw bytes (e.g. utf-8 text)


def encode_record(fields: Dict[str, Any]) -> bytes:
    out = bytearray()
    for name, value in fields.items():
        nb = name.encode()
        out.append(len(nb))
        out += nb
        if isinstance(value, (bytes, str)):
            payload = value.encode() if isinstance(value, str) else value
            out.append(_BYTES_CODE)
            out.append(1)
            out += np.uint32(len(payload)).tobytes()
            out += payload
        else:
            arr = np.ascontiguousarray(value)
            out.append(_DTYPE_CODE[arr.dtype])
            out.append(arr.ndim)
            out += np.asarray(arr.shape, np.uint32).tobytes()
            out += arr.tobytes()
    return bytes(out)


def decode_record(buf) -> Dict[str, Any]:
    view = memoryview(buf)
    fields: Dict[str, Any] = {}
    pos = 0
    while pos < len(view):
        nlen = view[pos]
        pos += 1
        name = bytes(view[pos: pos + nlen]).decode()
        pos += nlen
        code, ndim = view[pos], view[pos + 1]
        pos += 2
        dims = np.frombuffer(view, np.uint32, ndim, pos).tolist()
        pos += 4 * ndim
        if code == _BYTES_CODE:
            size = dims[0]
            fields[name] = bytes(view[pos: pos + size])
            pos += size
        else:
            dtype = np.dtype(DTYPES[code])
            count = int(np.prod(dims)) if dims else 1
            arr = np.frombuffer(view, dtype, count, pos).reshape(dims)
            fields[name] = arr
            pos += count * dtype.itemsize
    return fields


class RecordWriter:
    """Write a NovaRecords dataset directory."""

    def __init__(self, path: str):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self._data = open(os.path.join(path, "data.bin"), "wb")
        self._offsets: List[int] = [0]

    def write(self, fields: Dict[str, Any]):
        blob = encode_record(fields)
        self._data.write(blob)
        self._offsets.append(self._offsets[-1] + len(blob))

    def close(self, metadata: Optional[Dict] = None):
        self._data.close()
        np.asarray(self._offsets, np.uint64).tofile(
            os.path.join(self.path, "index.bin"))
        meta = {"entries": len(self._offsets) - 1}
        meta.update(metadata or {})
        with open(os.path.join(self.path, "METADATA"), "w") as f:
            json.dump(meta, f)


# ---------------------------------------------------------------------------
# native reader (ctypes) with numpy fallback
# ---------------------------------------------------------------------------

_LIB = None
_LIB_FAILED = False


def _native_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "native", "nova_records.cc")
    so = os.path.join(root, "native", "libnova_records.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so, src,
                            "-lpthread"], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.nr_open.restype = ctypes.c_void_p
        lib.nr_open.argtypes = [ctypes.c_char_p]
        lib.nr_num_records.restype = ctypes.c_int64
        lib.nr_num_records.argtypes = [ctypes.c_void_p]
        lib.nr_record.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.nr_record.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_uint64)]
        lib.nr_prefetch.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64]
        lib.nr_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


class RecordReader:
    """Random-access reader over a NovaRecords dir (native or numpy mmap)."""

    def __init__(self, path: str, use_native: bool = True):
        self.path = path
        self._lib = _native_lib() if use_native else None
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.nr_open(path.encode())
            if not self._handle:
                self._lib = None
        if self._handle is None:
            self._offsets = np.fromfile(os.path.join(path, "index.bin"),
                                        np.uint64)
            self._data = np.memmap(os.path.join(path, "data.bin"), np.uint8,
                                   "r")

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __len__(self) -> int:
        if self.native:
            return int(self._lib.nr_num_records(self._handle))
        return len(self._offsets) - 1

    def __getitem__(self, i: int) -> Dict[str, Any]:
        if self.native:
            size = ctypes.c_uint64()
            ptr = self._lib.nr_record(self._handle, int(i),
                                      ctypes.byref(size))
            if not ptr or size.value == 0:
                raise IndexError(i)
            buf = ctypes.cast(ptr, ctypes.POINTER(
                ctypes.c_uint8 * size.value)).contents
            return decode_record(bytes(buf))
        begin, end = int(self._offsets[i]), int(self._offsets[i + 1])
        return decode_record(self._data[begin:end].tobytes())

    def prefetch(self, indices: Sequence[int]):
        if self.native:
            arr = (ctypes.c_int64 * len(indices))(*[int(i) for i in indices])
            self._lib.nr_prefetch(self._handle, arr, len(indices))

    def close(self):
        if self.native and self._handle:
            self._lib.nr_close(self._handle)
            self._handle = None


class FeatureDataLoader:
    """Background-thread batch assembler with `.next()` API parity
    (`flex_loaders.py:168-172`, consumed at `train_engine.py:120`)."""

    def __init__(self, dataset: str, batch_size: int, seed: int = 0,
                 shuffle: bool = True, shard_id: Optional[int] = None,
                 num_shards: Optional[int] = None, prefetch: int = 4,
                 parse_fn=None, num_workers: int = 4):
        self.reader = RecordReader(dataset)
        self.batch_size = batch_size
        self._default_parse = parse_fn is None
        self.parse_fn = parse_fn or parse_features
        n = len(self.reader)
        if num_shards is None:
            try:
                import jax

                shard_id = jax.process_index()
                num_shards = jax.process_count()
            except Exception:
                shard_id, num_shards = 0, 1
        self.indices = np.arange(shard_id or 0, n, num_shards or 1)
        self.rng = np.random.RandomState(seed + (shard_id or 0))
        self.shuffle = shuffle
        # parallel record decode, reference semantics of the N FeatureWorker
        # processes + BalancedQueues (`flex_loaders.py:58-165`); threads
        # suffice here because decode is numpy (releases the GIL) over mmap
        self._pool = (ThreadPoolExecutor(num_workers)
                      if num_workers and num_workers > 1 else None)
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _epoch_indices(self):
        idx = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _worker(self):
        while not self._stop.is_set():
            order = self._epoch_indices()
            for i in range(0, len(order) - self.batch_size + 1,
                           self.batch_size):
                batch_idx = order[i: i + self.batch_size]
                next_idx = order[i + self.batch_size:
                                 i + 2 * self.batch_size]
                if len(next_idx):
                    self.reader.prefetch(next_idx)
                if self._default_parse:
                    # pre-draw the 50/50 caption picks from the seeded
                    # per-shard stream so parallel decode stays deterministic
                    us = self.rng.rand(len(batch_idx))
                    fn = lambda ju: parse_features(  # noqa: E731
                        self.reader[ju[0]], u=ju[1])
                    jobs = [(int(j), float(u))
                            for j, u in zip(batch_idx, us)]
                else:
                    fn = lambda ju: self.parse_fn(self.reader[ju[0]])  # noqa: E731
                    jobs = [(int(j), None) for j in batch_idx]
                examples = (list(self._pool.map(fn, jobs)) if self._pool
                            else [fn(j) for j in jobs])
                batch = _collate(examples)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return

    def next(self) -> Dict[str, np.ndarray]:
        return self._queue.get()

    __next__ = next

    def __iter__(self):
        return self

    def shutdown(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        # join the batcher thread BEFORE tearing down the decode pool — it
        # may be mid-`pool.map`, and submitting to a shut-down executor raises
        self._thread.join(timeout=5)
        if self._pool is not None:
            self._pool.shutdown(wait=False)
        self.reader.close()


def parse_features(record: Dict[str, Any],
                   rng: Optional[np.random.RandomState] = None,
                   u: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Decode one feature record (`flex_transforms.py:31-66` semantics).

    When both short and long caption embeds are stored, one is picked 50/50
    per example like the reference worker (`flex_transforms.py:49-57`).
    ``u`` is a pre-drawn uniform for that pick (FeatureDataLoader passes one
    from its seeded per-shard stream); otherwise ``rng`` is drawn from.
    """
    out: Dict[str, Any] = {}
    if "moments" in record:
        out["moments"] = record["moments"].astype(np.float32)
    if "latents" in record:
        out["latents"] = record["latents"].astype(np.float32)
    if "caption_embed" in record:
        emb = record["caption_embed"]
        if "caption_embed_long" in record:
            long_emb = record["caption_embed_long"]
            if long_emb.shape != emb.shape:
                raise ValueError(
                    "caption_embed and caption_embed_long must share one "
                    f"padded shape, got {emb.shape} vs {long_emb.shape}; "
                    "pad them to a common length at record-write time")
            r = u if u is not None else (rng or np.random).rand()
            emb = long_emb if r < 0.5 else emb
        out["text_embeds"] = emb.astype(np.float32)
    if "label" in record:
        out["labels"] = record["label"].astype(np.int32)
    if "text" in record:
        out["text"] = record["text"].decode() if isinstance(
            record["text"], bytes) else record["text"]
    if "motion_flow" in record:
        out["motion_flow"] = record["motion_flow"].astype(np.float32)
    if "points" in record:
        out["points"] = record["points"].astype(np.float32)
    return out


def _collate(examples: List[Dict[str, Any]]) -> Dict[str, Any]:
    batch: Dict[str, Any] = {}
    for k in examples[0]:
        vals = [e[k] for e in examples]
        batch[k] = vals if isinstance(vals[0], str) else np.stack(vals)
    return batch


def feature_batches(dataset: str, batch_size: int, seed: int = 0,
                    mesh=None) -> Iterator[Dict[str, Any]]:
    """Iterator facade used by scripts/train.py."""
    loader = FeatureDataLoader(dataset, batch_size, seed)
    while True:
        yield loader.next()
