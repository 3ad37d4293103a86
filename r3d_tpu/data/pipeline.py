"""Host-side batching pipeline with bucketed static shapes.

The reference pads each batch to its longest sequence inside a DataLoader
collate (basedataset.py:108-127) — per-batch dynamic shapes, which would
recompile XLA every step.  TPU-first design instead:

- sequences pad up to a small set of fixed buckets (DataConfig.seq_buckets)
  so every step hits a cached compilation;
- the pad mask rides along explicitly (past_label == pad_idx, as the models
  derive it — futr.py:58-60);
- a background thread prefetches and (optionally) lands batches on device,
  sharded over the mesh's data axis, double-buffered — the TPU analog of
  the reference's ``DataLoader(num_workers=8)`` (opts.py:76).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from r3d_tpu.data.protocol import Example


def bucket_length(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (last bucket truncates longer sequences,
    mirroring the reference's max_pos_len ceiling, opts.py:103)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def pad_batch(
    examples: List[Example],
    pad_idx: int,
    buckets: Sequence[int],
    n_query: int,
    with_depth: bool = False,
    with_query: bool = False,
    feature_dtype: str = "float32",
    query_pad_idx: Optional[int] = None,
    query_pad_len: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Collate examples into fixed-shape arrays.

    Feature/label padding values match the reference collate
    (basedataset.py:118-123): features pad with 0, labels with pad_idx.
    Integer query streams pad with ``query_pad_idx`` — the QUERY vocabulary's
    pad id (reference query_pad_idx=48,
    basedataset_proposed_breakfast.py:16,147), NOT the coarse-action pad_idx
    (which is a valid fine-action id). Falls back to pad_idx when not given.
    ``feature_dtype``: storage dtype of the feature/depth streams —
    'bfloat16' halves the HBM traffic of the raw-depth reads, the fusion
    step's measured bottleneck (profile: the depth-projection fusions are
    bandwidth-bound on the [B,S,19200] fp32 batch).
    """
    import jax.numpy as jnp

    f_dtype = jnp.bfloat16 if feature_dtype == "bfloat16" else np.float32
    max_len = max(e.features.shape[0] for e in examples)
    S = bucket_length(max_len, buckets)
    B = len(examples)
    C = examples[0].features.shape[1]

    features = np.zeros((B, S, C), dtype=f_dtype)
    past_label = np.full((B, S), pad_idx, dtype=np.int32)
    target = np.full((B, n_query), pad_idx, dtype=np.int32)
    dur = np.full((B, n_query), float(pad_idx), dtype=np.float32)

    depth = None
    if with_depth:
        d_feat = examples[0].depth_features
        depth = np.zeros((B, S) + d_feat.shape[1:], dtype=f_dtype)
    query = None
    query_len = None
    query_float = False
    if with_query:
        q0 = examples[0].query_label
        query_float = q0.ndim > 1 or np.issubdtype(q0.dtype, np.floating)
        if query_float:
            # continuous query stream (gaze [N, 2]): zero-padded to its OWN
            # static length — raw gaze sample counts are unrelated to the
            # frame bucket (basedataset_darai_gaze.py:186) — with the true
            # per-row lengths in ``query_len`` so models can mask the pad
            # rows out of the GazeCNN (reference zero-pads to the batch max,
            # which makes outputs batch-composition-dependent; COMPAT #31)
            Sq = int(query_pad_len) if query_pad_len else buckets[-1]
            query = np.zeros((B, Sq) + q0.shape[1:], dtype=np.float32)
            query_len = np.zeros((B,), dtype=np.int32)
        else:
            qpad = pad_idx if query_pad_idx is None else query_pad_idx
            query = np.full((B, S), qpad, dtype=np.int32)

    for i, e in enumerate(examples):
        s = min(e.features.shape[0], S)
        features[i, :s] = e.features[:s]
        past_label[i, :s] = e.past_label[:s]
        q = min(len(e.trans_future_target), n_query)
        target[i, :q] = e.trans_future_target[:q]
        dur[i, :q] = e.trans_future_dur[:q]
        if with_depth:
            depth[i, :s] = e.depth_features[:s]
        if with_query:
            if query_float:
                sq = min(len(e.query_label), query.shape[1])
                query[i, :sq] = e.query_label[:sq]
                query_len[i] = sq
            else:
                query[i, :s] = e.query_label[:s]

    batch = {
        "features": features,
        "past_label": past_label,
        "trans_future_target": target,
        "trans_future_dur": dur,
    }
    if with_depth:
        batch["depth_features"] = depth
    if with_query:
        batch["query_label"] = query
        if query_len is not None:
            batch["query_len"] = query_len
    return batch


class BucketedLoader:
    """Iterates (shuffled) examples grouped into same-bucket batches.

    ``make_example_fn(index) -> Example`` is called lazily; a background
    thread keeps ``prefetch`` collated batches ready.  Grouping by bucket
    before batching keeps padding waste low AND compilation count bounded.
    """

    def __init__(
        self,
        num_examples: int,
        make_example_fn: Callable[[int], Example],
        batch_size: int,
        pad_idx: int,
        buckets: Sequence[int],
        n_query: int,
        with_depth: bool = False,
        with_query: bool = False,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
        prefetch: int = 2,
        example_lengths: Optional[Sequence[int]] = None,
        feature_dtype: str = "float32",
        query_pad_idx: Optional[int] = None,
        query_pad_len: Optional[int] = None,
    ):
        self.num_examples = num_examples
        self.make_example_fn = make_example_fn
        self.batch_size = batch_size
        self.pad_idx = pad_idx
        self.buckets = tuple(buckets)
        self.n_query = n_query
        self.with_depth = with_depth
        self.with_query = with_query
        self.feature_dtype = feature_dtype
        self.query_pad_idx = query_pad_idx
        self.query_pad_len = query_pad_len
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.example_lengths = example_lengths
        self._epoch = 0

    def __len__(self) -> int:
        if self.drop_remainder:
            return self.num_examples // self.batch_size
        return -(-self.num_examples // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(self.num_examples)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        if self.example_lengths is not None:
            # group shuffled indices by bucket to reduce padding waste while
            # keeping within-bucket order random
            lengths = np.asarray(self.example_lengths)
            keys = np.array([bucket_length(l, self.buckets) for l in lengths[idx]])
            idx = idx[np.argsort(keys, kind="stable")]
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        self._epoch += 1
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_remainder:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    examples = [self.make_example_fn(int(i)) for i in b]
                    q.put(
                        pad_batch(
                            examples, self.pad_idx, self.buckets, self.n_query,
                            with_depth=self.with_depth, with_query=self.with_query,
                            feature_dtype=self.feature_dtype,
                            query_pad_idx=self.query_pad_idx,
                            query_pad_len=self.query_pad_len,
                        )
                    )
                q.put(stop)
            except BaseException as e:  # surface in the consumer — a
                q.put(e)                # swallowed error would silently
                                        # truncate the epoch

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
