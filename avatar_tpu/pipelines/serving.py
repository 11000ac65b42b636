"""Serving layer: dynamic-batched, fetch-overlapped avatar generation.

The reference has no serving story (its inference.py is a one-shot CLI).
For production TPU serving the rules are:

- one compiled pipeline per (H, W, F, steps, guidance-layout) bucket —
  requests are grouped by bucket so nothing ever recompiles on the hot path;
- same-bucket requests are coalesced into one batched generation up to
  ``max_batch`` (weight reads amortize across the batch: the 2B DiT step is
  MXU-bound, so batching is near-free throughput);
- device->host transfers overlap the next batch's compute
  (``copy_to_host_async`` — the same discipline bench.py measures);
- per-request PRNG keys drive the initial latent noise
  (pipeline ``sample_keys``), so a request's generation is independent of
  which batch it was coalesced into (exact for the avatar operating point;
  decode-time noise, when enabled, still draws from the batch key);
- avatar media (ref image + pose frames) are cached DEVICE-SIDE as
  VAE-encoded latents, keyed by the host array's identity: production
  traffic reuses the same avatar assets across requests, and without the
  cache every request re-ships the raw pixels host->device (38 MB of pose
  frames per 97f/256px request — the round-4 serving bottleneck: 3
  coalesced batches moved 456 MB over the tunnel, ~3x the compute time)
  and re-runs the VAE encode (~138 ms/video). Cached conditioning latents
  are encoded ONCE with a fixed key, making a request's conditioning
  deterministic and independent of batch composition (the uncached path
  keys the posterior sample off the batch leader's seed). Set
  ``media_cache_size=0`` for the legacy ship-pixels-per-batch path.

Synchronous JAX dispatch happens only on the worker thread; callers get
futures.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.pipelines.pipeline import GenerationParams, LTXVideoPipeline


@dataclass
class GenerationRequest:
    """One avatar generation: text embeddings + optional avatar media."""

    params: GenerationParams
    prompt_embeds: np.ndarray  # [1, L, caption_channels]
    prompt_attention_mask: np.ndarray  # [1, L]
    ref_image: Optional[np.ndarray] = None  # [1, 1, H, W, 3]
    pose_frames: Optional[np.ndarray] = None  # [1, F, H, W, 3]
    seed: int = 0
    output_type: str = "yuv420"


def _bucket_key(req: GenerationRequest) -> Tuple:
    """Coalescing key: EVERY GenerationParams field (a batch runs with the
    leader's params, so any field differing across coalesced requests would
    silently generate the wrong thing — e.g. solver, frame_rate, or
    vae_per_channel_normalize), plus the request-shape fields."""
    import dataclasses

    p = req.params
    return (
        tuple(
            _as_tuple(getattr(p, f.name))
            for f in dataclasses.fields(GenerationParams)
        ),
        req.prompt_embeds.shape, req.ref_image is not None,
        req.pose_frames is not None, req.output_type,
    )


def _as_tuple(v):
    if isinstance(v, (list, tuple)):
        return tuple(_as_tuple(x) for x in v)
    return v


class _LatentCache:
    """Identity-keyed host-media -> device-latents cache (LRU).

    An entry holds a WEAK reference to the host array plus its VAE-encoded
    latents on device: ``id()``-keying is only valid while the caller's
    array is alive, and the weakref means the cache never pins pixels the
    caller dropped (38 MB of pose frames per 97f/256px request — 64 pinned
    entries would be ~2.4 GB of host RAM for a client that re-loads media
    per request and can never hit). Cached latents are ~200x smaller than
    the pixels they encode ([1,13,8,8,128] bf16 = 213 KB), so the entry
    cap prices only them. Hits require the caller to reuse the SAME array
    object across requests — the natural pattern for resident avatar
    assets, and the only pattern id-keying can serve.
    """

    def __init__(self, capacity: int):
        from collections import OrderedDict

        self.capacity = capacity
        self._entries: "OrderedDict[Tuple, Tuple[Any, Any]]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, media, extra_key, encode):
        import weakref

        key = (id(media), extra_key)
        ent = self._entries.get(key)
        if ent is not None and ent[0]() is media:
            self._entries.move_to_end(key)
            self.hits += 1
            return ent[1]
        self.misses += 1
        latents = encode(media)
        try:
            ref = weakref.ref(media)
        except TypeError:  # non-weakrefable media: don't cache
            return latents
        self._entries[key] = (ref, latents)
        self._entries.move_to_end(key)
        # drop dead entries first (their id() keys may be reused), then LRU
        for k in [k for k, (r, _) in self._entries.items() if r() is None]:
            del self._entries[k]
        while len(self._entries) > self.capacity:
            self._entries.popitem(last=False)
        return latents


class AvatarServer:
    """Dynamic-batching request server over one :class:`LTXVideoPipeline`.

    Usage::

        server = AvatarServer(pipeline, max_batch=4)
        fut = server.submit(GenerationRequest(...))
        video = fut.result()   # numpy frames
        server.shutdown()
    """

    def __init__(
        self,
        pipeline: LTXVideoPipeline,
        max_batch: int = 4,
        batch_window_s: float = 0.02,
        media_cache_size: int = 64,
    ):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self._media_cache = _LatentCache(media_cache_size)
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._pending_fetch: List[Tuple[List[Future], Any]] = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.stats: Dict[str, int] = {"batches": 0, "requests": 0}

    # -- client API -------------------------------------------------------

    def submit(self, request: GenerationRequest) -> Future:
        if self._closed:
            raise RuntimeError("server is shut down")
        fut: Future = Future()
        self._queue.put((request, fut))
        return fut

    def shutdown(self, wait: bool = True) -> None:
        self._closed = True
        self._queue.put(None)
        if wait:
            self._worker.join()

    # -- worker -----------------------------------------------------------

    def _collect_batch(self):
        """Block for one request, then greedily coalesce same-bucket
        requests arriving within the batch window."""
        first = self._queue.get()
        if first is None:
            return None
        key = _bucket_key(first[0])
        batch = [first]
        while len(batch) < self.max_batch:
            try:
                item = self._queue.get(timeout=self.batch_window_s)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-signal shutdown
                break
            if _bucket_key(item[0]) == key:
                batch.append(item)
            else:
                self._queue.put(item)  # different bucket: next round
                break
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect_batch()
            if batch is None:
                self._drain_fetches()
                return
            try:
                self._dispatch(batch)
            except Exception as e:  # noqa: BLE001 — fail the futures
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            # keep the newest generation in flight only if more work is
            # queued (its fetch then overlaps the next batch's compute);
            # otherwise resolve everything so callers aren't left waiting
            self._drain_fetches(keep_last=not self._queue.empty())

    def _dispatch(self, batch) -> None:
        reqs = [r for r, _ in batch]
        futs = [f for _, f in batch]
        r0 = reqs[0]

        # data-parallel pipelines need the batch to be a multiple of the
        # mesh axis: pad by repeating the last request and drop its outputs
        # (per-request determinism holds — each sample's noise comes from
        # its own key, independent of batch composition)
        n_real = len(reqs)
        n_pad = 0
        if getattr(self.pipeline, "dp_mesh", None) is not None:
            ndev = self.pipeline.dp_mesh.shape[self.pipeline.dp_axis]
            n_pad = (-n_real) % ndev

        def stack(getter):
            parts = [getter(r) for r in reqs]
            if any(p is None for p in parts):
                return None
            parts = parts + [parts[-1]] * n_pad
            return jnp.concatenate([jnp.asarray(p) for p in parts])

        embeds = stack(lambda r: r.prompt_embeds)
        mask = stack(lambda r: r.prompt_attention_mask)
        ref = pose = ref_lat = pose_lat = None
        if self._media_cache.capacity > 0:
            # avatar media ride the latent cache: each distinct host array
            # is shipped + VAE-encoded once (fixed encode key -> the
            # conditioning is deterministic per media, independent of batch
            # composition), and coalescing concatenates the ~KB latents
            # instead of re-uploading MBs of pixels per request
            pcn = r0.params.vae_per_channel_normalize

            def encode_one(media):
                return self.pipeline.encode_media(
                    jnp.asarray(media).astype(jnp.bfloat16),
                    jax.random.PRNGKey(0), pcn,
                )

            def stack_latents(getter):
                parts = [getter(r) for r in reqs]
                if any(p is None for p in parts):
                    return None
                parts = [
                    self._media_cache.get(p, pcn, encode_one) for p in parts
                ]
                parts = parts + [parts[-1]] * n_pad
                return jnp.concatenate(parts)

            ref_lat = stack_latents(lambda r: r.ref_image)
            pose_lat = stack_latents(lambda r: r.pose_frames)
        else:
            ref = stack(lambda r: r.ref_image)
            pose = stack(lambda r: r.pose_frames)
        # per-request keys: the initial noise of each sample depends only on
        # its own seed, not on batch composition
        sample_keys = jnp.stack(
            [jax.random.PRNGKey(r.seed) for r in reqs]
            + [jax.random.PRNGKey(reqs[-1].seed)] * n_pad
        )
        out = self.pipeline(
            r0.params, jax.random.PRNGKey(r0.seed), embeds, mask,
            ref_image=ref, pose_frames=pose,
            ref_latents=ref_lat, pose_latents=pose_lat,
            output_type=r0.output_type,
            sample_keys=sample_keys,
        )
        if hasattr(out, "copy_to_host_async"):
            out.copy_to_host_async()
        self._pending_fetch.append((futs, out))
        self.stats["batches"] += 1
        self.stats["requests"] += len(reqs)

    def _drain_fetches(self, keep_last: bool = False) -> None:
        """Resolve finished generations; with keep_last, leave the most
        recent in flight so its fetch overlaps the next batch's compute."""
        limit = 1 if keep_last else 0
        while len(self._pending_fetch) > limit:
            futs, out = self._pending_fetch.pop(0)
            arr = np.asarray(out)
            for i, fut in enumerate(futs):
                if not fut.done():
                    fut.set_result(arr[i])
