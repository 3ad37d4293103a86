"""Device-resident dataset cache: whole-epoch training with zero per-step H2D.

The reference feeds every step from a host DataLoader (opts.py:76,
train/train_proposed_depth.py:127) — fine when the accelerator sits on PCIe,
but each step still pays host collation + a host->device copy.  The featurized
anticipation datasets are small (UTKinect: ~200 videos x ~300 frames; depth
160x120 bf16 ~= 2.3 GB), so the TPU-first design is to land the dataset in
HBM ONCE and assemble batches on device:

- per-VIDEO arrays (features/depth/labels/query) padded to the max video
  length — the observation-ratio replication that multiplies the reference's
  dataset 10x (basedataset_utkinects.py:31-42) becomes an index table of
  (video, observed_len) views instead of copies;
- a batch is a gather: ``rows = arange(S) * sample_rate`` against the view's
  video, masked by the view's observed window — bit-identical to the host
  collate (``pipeline.pad_batch``), verified in tests/test_device_cache.py;
- the gather runs INSIDE the jitted train step, so an epoch needs only a tiny
  [steps, B] int32 index table from the host; with
  ``Trainer.make_cached_train_fn`` scanning K steps per dispatch, a
  single-bucket epoch is one dispatch.

Transcripts (run-length encoding of the future window) stay a host-side
precompute per view — they are [n_query]-sized and data-dependent, exactly
what XLA should not trace.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from r3d_tpu.data.pipeline import bucket_length
from r3d_tpu.data.protocol import indices_to_transcript, pad_transcript


@dataclasses.dataclass
class DeviceCache:
    """Device arrays + host-side view/bucket metadata."""

    # device (jnp) arrays --------------------------------------------------
    data: Dict[str, jnp.ndarray]
    # data keys:
    #   features   [V, Lf, D]   feature_dtype
    #   labels     [V, Ll]      int32
    #   depth      [V, Ld, ...] feature_dtype      (optional)
    #   query      [V, Lq]/[V, Lq, 2]              (optional; int32 or f32)
    #   len_feat / len_lab / len_depth / len_query [V] int32
    #   view_vid   [N] int32    video index of each (video, obs_perc) view
    #   view_nrows [N] int32    sampled observed rows of the view
    #   view_target[N, n_query] int32
    #   view_dur   [N, n_query] float32
    # host metadata --------------------------------------------------------
    n_views: int
    nrows_host: np.ndarray          # [N] int — for bucket planning
    sample_rate: int
    pad_idx: int
    query_pad_idx: Optional[int]
    buckets: Sequence[int]
    n_query: int
    feature_dtype: str
    nbytes: int


def build_video_arrays(
    videos: List[Dict],
    feature_dtype: str = "float32",
    max_bytes: int = 12 << 30,
) -> Dict[str, jnp.ndarray]:
    """Per-video device arrays (features/labels/depth/query + lengths),
    padded to the longest video. The shared substrate of the train cache
    (build_cache) and the cached predict sweep (assemble_eval)."""
    f_np = jnp.bfloat16 if feature_dtype == "bfloat16" else np.float32
    itemsize = 2 if feature_dtype == "bfloat16" else 4

    V = len(videos)
    len_feat = np.array([v["features"].shape[0] for v in videos], np.int32)
    len_lab = np.array([len(v["label_idx"]) for v in videos], np.int32)
    with_depth = "depth" in videos[0]
    with_query = videos[0].get("query_idx") is not None
    len_depth = (
        np.array([v["depth"].shape[0] for v in videos], np.int32)
        if with_depth else np.zeros(V, np.int32)
    )
    len_query = (
        np.array([len(v["query_idx"]) for v in videos], np.int32)
        if with_query else np.zeros(V, np.int32)
    )

    D = videos[0]["features"].shape[1]
    d_shape = tuple(videos[0]["depth"].shape[1:]) if with_depth else ()
    est = (
        V * int(len_feat.max()) * D * itemsize
        + V * int(len_lab.max()) * 4
        + (V * int(len_depth.max()) * int(np.prod(d_shape)) * itemsize
           if with_depth else 0)
    )
    if est > max_bytes:
        raise MemoryError(
            f"device cache would need ~{est >> 20} MiB > budget "
            f"{max_bytes >> 20} MiB; use the host loader"
        )

    def stack_padded(key, Lmax, dtype, fill=0):
        out = np.full((V, Lmax) + np.shape(videos[0][key])[1:], fill, dtype)
        for i, v in enumerate(videos):
            out[i, : len(v[key])] = v[key]
        return out

    # stage bf16 on HOST (numpy writes cast per video, exactly how
    # pad_batch builds bf16 batches) — shipping fp32 and casting on device
    # would double the one-time H2D and transiently hold fp32+bf16 copies,
    # blowing past the max_bytes guard
    data: Dict[str, jnp.ndarray] = {
        "features": jnp.asarray(
            stack_padded("features", int(len_feat.max()), f_np)
        ),
        "labels": jnp.asarray(
            stack_padded("label_idx", int(len_lab.max()), np.int32)
        ),
        "len_feat": jnp.asarray(len_feat),
        "len_lab": jnp.asarray(len_lab),
    }
    if with_depth:
        data["depth"] = jnp.asarray(
            stack_padded("depth", int(len_depth.max()), f_np)
        )
        data["len_depth"] = jnp.asarray(len_depth)
    if with_query:
        q0 = np.asarray(videos[0]["query_idx"])
        continuous = q0.ndim > 1 or np.issubdtype(q0.dtype, np.floating)
        data["query"] = jnp.asarray(
            stack_padded(
                "query_idx", int(len_query.max()),
                np.float32 if continuous else np.int32,
            )
        )
        data["len_query"] = jnp.asarray(len_query)
    return data


def build_cache(
    videos: List[Dict],
    obs_percs: Sequence[float],
    sample_rate: int,
    n_query: int,
    pad_idx: int,
    n_class: int,
    buckets: Sequence[int],
    feature_dtype: str = "float32",
    query_pad_idx: Optional[int] = None,
    max_bytes: int = 12 << 30,
    future_frames: Optional[int] = None,
) -> DeviceCache:
    """videos: dicts with 'features' [L,D], 'label_idx' [L] int, optional
    'depth' [L,...] and 'query_idx' ([L] int or [L,2] float).

    Raises MemoryError when the estimated device footprint exceeds
    ``max_bytes`` — callers fall back to the host loader.
    """
    none_idx = n_class - 1
    data = build_video_arrays(videos, feature_dtype, max_bytes)

    # ---- view table: one row per (video, obs_perc), transcripts on host
    view_vid, view_nrows, tgts, durs = [], [], [], []
    for vi, v in enumerate(videos):
        idx = np.asarray(v["label_idx"])
        vid_len = len(idx)
        n_feat = len(v["features"])
        for obs in obs_percs:
            observed = int(obs * vid_len)
            # mirror protocol.make_example_from_indices' future window
            pred = (
                future_frames * sample_rate
                if future_frames is not None
                else int(0.5 * vid_len)
            )
            past = idx[:observed][::sample_rate]
            # the host collate truncates past_label/query to the FEATURE
            # stream's strided row count (pad_batch's s = min(feat rows, S));
            # clamp the view window the same way so a video whose feature
            # file is a few rows short of its gt still matches bit-for-bit
            feat_rows = -(-min(n_feat, observed) // sample_rate)
            future = idx[observed : observed + pred][::sample_rate]
            trans, trans_dur = indices_to_transcript(future)
            target, dur = pad_transcript(
                trans, trans_dur, n_query, pad_idx, none_idx
            )
            view_vid.append(vi)
            view_nrows.append(min(len(past), feat_rows))
            tgts.append(target.astype(np.int32))
            durs.append(dur.astype(np.float32))

    nrows_host = np.array(view_nrows, np.int64)
    data.update(
        view_vid=jnp.asarray(np.array(view_vid, np.int32)),
        view_nrows=jnp.asarray(nrows_host.astype(np.int32)),
        view_target=jnp.asarray(np.stack(tgts)),
        view_dur=jnp.asarray(np.stack(durs)),
    )
    nbytes = sum(int(x.size) * x.dtype.itemsize for x in data.values())
    return DeviceCache(
        data=data,
        n_views=len(view_vid),
        nrows_host=nrows_host,
        sample_rate=sample_rate,
        pad_idx=pad_idx,
        query_pad_idx=query_pad_idx,
        buckets=tuple(buckets),
        n_query=n_query,
        feature_dtype=feature_dtype,
        nbytes=nbytes,
    )


def probe_footprint(source, cfg, max_bytes: int) -> None:
    """Estimate the cache footprint from npy headers (mmap) BEFORE loading
    anything, so an oversized dataset is rejected without first filling host
    RAM.  Best-effort: unreadable headers defer to the post-load check."""
    if cfg.raw_frames:
        return
    try:
        est = 0
        itemsize = 2 if cfg.feature_dtype == "bfloat16" else 4
        lf, ld = [], []
        seen_depth = set()
        for vid, seq in source.units():
            vid_file = vid.split("/")[-1]
            f = np.load(source._feature_file(vid_file, seq), mmap_mode="r")
            lf.append(f.shape)
            if source.depth_path is not None:
                # multi-sequence units share one whole-video depth file
                # (always the seq-1 stack; load_video slices it per
                # sequence) — counting the full stack once per UNIT would
                # inflate the estimate ~n_sequences-fold and spuriously
                # force the host-loader fallback
                dpath = source._depth_file(vid_file, seq)
                if dpath not in seen_depth:
                    seen_depth.add(dpath)
                    d = np.load(dpath, mmap_mode="r")
                    ld.append(d.shape)
        if lf:
            # breakfast/50salads store [C, S] (features_transposed)
            rows = lambda s: s[-1] if cfg.features_transposed else s[0]
            Lmax = max(rows(s) for s in lf)
            row_elems = (
                lf[0][0] if cfg.features_transposed
                else int(np.prod(lf[0][1:]))
            )
            est += len(lf) * Lmax * row_elems * itemsize
        if ld:
            Lmax = max(s[0] for s in ld)
            est += len(ld) * Lmax * int(np.prod(ld[0][1:])) * itemsize
    except (OSError, ValueError):
        return  # probe is best-effort; build re-checks after loading
    if est > max_bytes:
        raise MemoryError(
            f"device cache would need ~{est >> 20} MiB > budget "
            f"{max_bytes >> 20} MiB; use the host loader"
        )


def arrays_from_source(source, cfg,
                       max_bytes: int = 12 << 30) -> Dict[str, jnp.ndarray]:
    """Probe-then-load video arrays for the cached predict sweep."""
    probe_footprint(source, cfg, max_bytes)
    return build_video_arrays(
        videos_from_source(source, cfg), cfg.feature_dtype, max_bytes
    )


def cache_from_source(source, cfg, n_query: int,
                      max_bytes: int = 12 << 30) -> DeviceCache:
    """Build from a datasets.VideoSource (flat or multi-sequence layout)."""
    if cfg.gaze_dir is not None:
        # gaze query streams window by raw gaze length, not the frame
        # window (datasets.VideoSource._gaze_window) — the cached in-step
        # assembly has no gaze gather; use the host loader
        raise ValueError("device cache does not support gaze query streams")
    probe_footprint(source, cfg, max_bytes)
    videos = videos_from_source(source, cfg)
    return build_cache(
        videos,
        obs_percs=cfg.train_obs_percs,
        sample_rate=cfg.sample_rate,
        n_query=n_query,
        pad_idx=source.pad_idx,
        n_class=source.n_class,
        buckets=cfg.seq_buckets,
        feature_dtype=cfg.feature_dtype,
        query_pad_idx=(
            len(source.query_dict) if source.query_dict is not None else None
        ),
        max_bytes=max_bytes,
        future_frames=cfg.future_frames,
    )


def _gather_window(arr: jnp.ndarray, vid: jnp.ndarray, in_view: jnp.ndarray,
                   S: int, sample_rate: int, fill,
                   dtype=None) -> jnp.ndarray:
    """[B] video ids -> [B, S, ...] strided observed windows.

    The window rows (``arange(S) * sample_rate``) are STATIC, so instead of
    a 2D advanced-index gather (measured ~16% of HBM bandwidth on v5e) this
    vmaps a contiguous per-video dynamic_slice and applies a static strided
    slice — a plain block copy.  Rows past a stream's true length are zeros
    in the padded storage, which matches the host collate's zero padding;
    ``in_view`` masks everything past the view's observed window with
    ``fill``.

    Multi-axis rows (raw depth frames [V, L, H, W]) gather FLATTENED to
    [V, L, H*W] and reshape back afterwards: XLA's layout assignment for a
    5D dynamic-slice loop picks exotic layouts — the r5 fusion-cached trace
    showed a whole-cache [64,256,160,120] relayout copy EVERY dispatch
    (2.0 ms for 1.5 GB) plus per-row {2,4,3,0,1} slice relayouts, ~0.55
    ms/step of the 1.5 ms cached step.  The flatten/unflatten pair is a
    value-preserving row-major reshape (bit-exactness unchanged); on 3D
    arrays the whole-cache copy vanishes and the gather leaves drop to
    ~0.22 ms/step — same-process interleaved A/B on the fusion cached
    step: 1.49 -> 1.32 ms/step (1.13x; ROADMAP r5).
    """
    trail = arr.shape[2:]
    if len(trail) > 1 and os.environ.get("R3D_GATHER_5D") != "1":
        # R3D_GATHER_5D=1 restores the direct multi-axis slice (the
        # measurement knob for the A/B above)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
        g = _gather_window(flat, vid, in_view, S, sample_rate, fill, dtype)
        return g.reshape(g.shape[:2] + trail)
    need = min((S - 1) * sample_rate + 1, arr.shape[1])

    def one(v):
        start = (v,) + (0,) * (arr.ndim - 1)
        return jax.lax.dynamic_slice(
            arr, start, (1, need) + arr.shape[2:]
        )[0]

    g = jax.vmap(one)(vid)[:, ::sample_rate]                  # [B, <=S, ...]
    if g.shape[1] < S:
        g = jnp.pad(
            g, ((0, 0), (0, S - g.shape[1])) + ((0, 0),) * (g.ndim - 2)
        )
    ok = in_view.reshape(in_view.shape + (1,) * (g.ndim - 2))
    return jnp.where(ok, g, jnp.asarray(fill, g.dtype)).astype(dtype or g.dtype)


def assemble(data: Dict[str, jnp.ndarray], view_ids: jnp.ndarray, S: int,
             sample_rate: int, pad_idx: int,
             query_pad_idx: Optional[int]) -> Dict[str, jnp.ndarray]:
    """Pure-jax batch assembly: gather the views' observed windows into the
    exact arrays ``pipeline.pad_batch`` would produce (same dtypes, same
    padding values). ``S`` is the static bucket length of this batch.

    Mask note: ``j < nrows`` implies row ``j*sample_rate`` lies inside the
    observed window AND inside the label stream (nrows counts exactly those
    rows), so a single in-view mask suffices; feature/depth rows past a
    short stream are zeros in storage, same as the host collate leaves them.
    """
    vid = data["view_vid"][view_ids]                             # [B]
    nrows = data["view_nrows"][view_ids]                         # [B]
    j = jnp.arange(S, dtype=jnp.int32)[None, :]                  # [1, S]
    in_view = j < nrows[:, None]                                 # [B, S]

    def gather(arr, fill, dtype=None):
        return _gather_window(arr, vid, in_view, S, sample_rate, fill, dtype)

    batch = {
        "features": gather(data["features"], 0),
        "past_label": gather(data["labels"], pad_idx, jnp.int32),
        "trans_future_target": data["view_target"][view_ids],
        "trans_future_dur": data["view_dur"][view_ids],
    }
    if "depth" in data:
        batch["depth_features"] = gather(data["depth"], 0)
    if "query" in data:
        q = data["query"]
        qfill = (
            0.0
            if jnp.issubdtype(q.dtype, jnp.floating)
            else (pad_idx if query_pad_idx is None else query_pad_idx)
        )
        batch["query_label"] = gather(q, qfill)
    return batch


def assemble_eval(data: Dict[str, jnp.ndarray], vid: jnp.ndarray,
                  real_s: jnp.ndarray, S: int,
                  sample_rate: int) -> Dict[str, jnp.ndarray]:
    """Gather predict-time observed windows (Predictor._forward_batch's host
    padding, on device): ``vid``/``real_s`` are [B] video indices and valid
    strided-row counts; returns features/mask (+depth/query) shaped [B, S,
    ...].  Filler rows (real_s == 0) keep frame 0 unmasked, matching the
    host path (eval/predict.py:116-117)."""
    j = jnp.arange(S, dtype=jnp.int32)[None, :]
    in_view = j < real_s[:, None]

    def gather(arr, fill):
        return _gather_window(arr, vid, in_view, S, sample_rate, fill)

    mask = ~in_view
    mask = mask.at[:, 0].set(False)
    out = {
        "features": gather(data["features"], 0),
        "mask": mask,
    }
    if "depth" in data:
        out["depth"] = gather(data["depth"], 0)
    if "query" in data:
        # host predict zero-fills query padding (eval/predict.py:125-127)
        out["query"] = gather(data["query"], 0)
    return out


def videos_from_source(source, cfg) -> List[Dict]:
    """Load every (vid, seq) unit's arrays for build_video_arrays."""
    videos = []
    for vid, seq in source.units():
        v = source.load_video(vid, seq)
        videos.append(
            {
                "features": np.asarray(v["features"], np.float32),
                "label_idx": np.asarray(v["label_idx"]),
                **(
                    {"depth": np.asarray(v["depth"], np.float32)}
                    if v.get("depth") is not None else {}
                ),
                **(
                    {"query_idx": v["query_idx"]}
                    if v.get("query_idx") is not None else {}
                ),
            }
        )
    return videos


@dataclasses.dataclass
class HybridCache:
    """Partial device cache for datasets over the HBM budget.

    The units whose padded footprint fits ``max_bytes`` live in a
    :class:`DeviceCache`; the rest stay on disk and stream through the host
    collate.  Batches keep the host loader's EXACT global shuffle order
    (``hybrid_epoch_plan`` mirrors ``BucketedLoader._order``): each batch's
    cached rows are gathered from HBM inside the jitted step while its host
    rows ship as a COMPACTED ``[Bh, ...]`` buffer and scatter into their
    batch positions on device — so the per-step H2D shrinks by the cached
    fraction without changing a single batch's composition.  fit_hybrid ==
    fit bit-exactly (tests/test_hybrid_cache.py).
    """

    cache: DeviceCache                  # device arrays for the cached units
    n_views: int                        # ALL (unit, obs_perc) views
    view_cached_id: np.ndarray          # [N] int32: id into cache's view
                                        # table, or -1 for a host view
    host_example: "object"              # Callable[int -> Example] (global
                                        # view id; only host views queried)
    n_obs: int
    with_depth: bool
    with_query: bool

    @property
    def host_frac(self) -> float:
        return float(np.mean(self.view_cached_id < 0))


def _unit_probe(source, cfg):
    """Header-probe each unit's feature/depth/label row counts (npy headers
    + gt line counts — no data loads).  Returns (units, feat_rows,
    feat_row_bytes, depth_rows, depth_row_bytes, label_rows)."""
    import os

    itemsize = 2 if cfg.feature_dtype == "bfloat16" else 4
    units = list(source.units())
    feat_rows, depth_rows, label_rows = [], [], []
    feat_rb = depth_rb = 0
    for vid, seq in units:
        vid_file = vid.split("/")[-1]
        f = np.load(source._feature_file(vid_file, seq), mmap_mode="r")
        rows = f.shape[-1] if cfg.features_transposed else f.shape[0]
        feat_rb = (
            f.shape[0] if cfg.features_transposed else int(np.prod(f.shape[1:]))
        ) * itemsize
        feat_rows.append(int(rows))
        with open(source._gt_file(vid_file, seq), "rb") as fh:
            # raw line count >= valid label rows (safe upper bound)
            label_rows.append(sum(1 for _ in fh))
        if source.depth_path is not None:
            d = np.load(
                source._depth_file(vid_file, seq), mmap_mode="r"
            )
            depth_rows.append(int(d.shape[0]))
            depth_rb = int(np.prod(d.shape[1:])) * itemsize
    return (units, np.array(feat_rows), feat_rb, np.array(depth_rows),
            depth_rb, np.array(label_rows))


def hybrid_cache_from_source(
    source, cfg, n_query: int, max_bytes: int = 12 << 30,
    policy: str = "longest",
):
    """Build a :class:`HybridCache`: greedily cache units by ``policy``
    until the padded footprint estimate hits ``max_bytes``.  Raises
    MemoryError when not even the smallest unit fits.

    - ``'longest'`` (default): longest units first — the remaining host
      rows are SHORT, so the per-batch host part ships at a small
      own-bucket length (fit_hybrid pads the host part to
      bucket(host max), not the batch bucket), and the budget fills
      completely (the per-unit cost model charges pad-to-resident-max, so
      the first unit already sets the max).
    - ``'ascending'``: shortest units first — maximizes the number of
      device-resident views, but leaves the LONGEST videos streaming
      through the host AND strands budget the moment one long unit would
      raise the pad-to-max cost of every resident.

    Measured A/B on the chip (tools/measure_hybrid.py ab, 2026-08 r4;
    bimodal 128/512-frame videos, same 50% byte budget): longest 16.8
    clips/s = 9.88x the host loader (short host rows ride the small
    bucket) vs ascending 2.4 = 1.41x (its hosts rows are the 512-frame
    monsters, and the pad-to-max model let it use only a quarter of the
    budget).  On equal-length datasets the policies coincide.  'longest'
    is therefore the default; 'ascending' remains for view-count-bound
    workloads.  Raises MemoryError when policy='longest' and the longest
    unit alone exceeds the budget — switch to 'ascending' to cache
    something.
    """
    if policy not in ("ascending", "longest"):
        raise ValueError(f"unknown hybrid cache policy {policy!r} "
                         "(supported: 'ascending', 'longest')")
    if cfg.gaze_dir is not None:
        raise ValueError("device cache does not support gaze query streams")
    if cfg.raw_frames or cfg.multi_sequence:
        # multi-seq units share whole-video depth stacks sliced per
        # sequence at load — the header probe can't see per-unit windows
        raise ValueError("hybrid cache supports the flat on-disk layout")
    units, frows, frb, drows, drb, lrows = _unit_probe(source, cfg)
    order = np.argsort(frows, kind="stable")
    if policy == "longest":
        order = order[::-1]
    cached_pos: List[int] = []
    fmax = dmax = lmax = 0
    for j in order:
        fmax_j = max(fmax, int(frows[j]))
        dmax_j = max(dmax, int(drows[j])) if len(drows) else 0
        lmax_j = max(lmax, int(lrows[j]))
        n = len(cached_pos) + 1
        if n * (fmax_j * frb + dmax_j * drb + lmax_j * 4) > max_bytes:
            break
        cached_pos.append(int(j))
        fmax, dmax, lmax = fmax_j, dmax_j, lmax_j
    if not cached_pos:
        raise MemoryError(
            "hybrid cache: not even the smallest unit fits the budget"
        )
    cached_pos_set = sorted(cached_pos)  # keep source.units() order
    videos = []
    for u in cached_pos_set:
        vid, seq = units[u]
        v = source.load_video(vid, seq)
        videos.append(
            {
                "features": np.asarray(v["features"], np.float32),
                "label_idx": np.asarray(v["label_idx"]),
                **(
                    {"depth": np.asarray(v["depth"], np.float32)}
                    if v.get("depth") is not None else {}
                ),
                **(
                    {"query_idx": v["query_idx"]}
                    if v.get("query_idx") is not None else {}
                ),
            }
        )
    cache = build_cache(
        videos,
        obs_percs=cfg.train_obs_percs,
        sample_rate=cfg.sample_rate,
        n_query=n_query,
        pad_idx=source.pad_idx,
        n_class=source.n_class,
        buckets=cfg.seq_buckets,
        feature_dtype=cfg.feature_dtype,
        query_pad_idx=(
            len(source.query_dict) if source.query_dict is not None else None
        ),
        max_bytes=max_bytes,
        future_frames=cfg.future_frames,
    )

    n_obs = len(cfg.train_obs_percs)
    n_views = len(units) * n_obs
    view_cached_id = np.full(n_views, -1, np.int32)
    for j, u in enumerate(cached_pos_set):
        for o in range(n_obs):
            view_cached_id[u * n_obs + o] = j * n_obs + o

    obs_percs = tuple(cfg.train_obs_percs)

    def host_example(g: int):
        vid, seq = units[g // n_obs]
        return source.make_example(
            vid, obs_percs[g % n_obs], cfg.sample_rate, n_query, seq=seq
        )

    return HybridCache(
        cache=cache,
        n_views=n_views,
        view_cached_id=view_cached_id,
        host_example=host_example,
        n_obs=n_obs,
        with_depth=source.depth_path is not None,
        with_query=source.query_dict is not None,
    )


def hybrid_epoch_plan(
    h: HybridCache, batch_size: int, seed: int, epoch: int
) -> List[np.ndarray]:
    """The host loader's exact epoch order (``BucketedLoader._order`` with
    shuffle, no length grouping): shuffled global view ids in consecutive
    ``batch_size`` chunks — batch composition is IDENTICAL to fit()'s."""
    order = np.arange(h.n_views)
    np.random.RandomState(seed + epoch).shuffle(order)
    return [
        order[i : i + batch_size].astype(np.int32)
        for i in range(0, len(order), batch_size)
    ]


def epoch_plan(
    cache: DeviceCache,
    batch_size: int,
    seed: int,
    epoch: int,
    shuffle: bool = True,
    drop_remainder: bool = True,
) -> List[tuple]:
    """Host-side epoch plan mirroring BucketedLoader._order + batching:
    shuffled views, consecutive chunks, each batch's bucket = smallest
    bucket >= its longest view.  Returns [(S, idx [B] np.int32), ...].
    """
    order = np.arange(cache.n_views)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(order)
    plan = []
    for i in range(0, len(order), batch_size):
        chunk = order[i : i + batch_size]
        if drop_remainder and len(chunk) < batch_size:
            continue
        S = bucket_length(
            int(cache.nrows_host[chunk].max()), cache.buckets
        )
        plan.append((S, chunk.astype(np.int32)))
    return plan
