"""BucketedLoader / pad_batch unit tests."""

import numpy as np

from r3d_tpu.data.pipeline import BucketedLoader, bucket_length, pad_batch
from r3d_tpu.data.protocol import Example


def _ex(s, c=4, nq=4):
    return Example(
        features=np.ones((s, c), np.float32),
        past_label=np.arange(s, dtype=np.int64),
        trans_future_target=np.arange(nq, dtype=np.int64),
        trans_future_dur=np.ones(nq, np.float32),
    )


def test_bucket_length():
    assert bucket_length(10, (16, 32)) == 16
    assert bucket_length(16, (16, 32)) == 16
    assert bucket_length(17, (16, 32)) == 32
    assert bucket_length(100, (16, 32)) == 32  # truncating ceiling


def test_pad_batch_shapes_and_values():
    batch = pad_batch([_ex(5), _ex(9)], pad_idx=77, buckets=(16,), n_query=4)
    assert batch["features"].shape == (2, 16, 4)
    assert np.all(batch["features"][0, 5:] == 0)
    assert np.all(batch["past_label"][0, 5:] == 77)
    assert np.all(batch["past_label"][1, :9] == np.arange(9))


def test_pad_batch_truncates_over_bucket():
    batch = pad_batch([_ex(40)], pad_idx=77, buckets=(16,), n_query=4)
    assert batch["features"].shape == (1, 16, 4)
    assert np.all(batch["past_label"][0] == np.arange(16))


def test_loader_epoch_coverage_and_drop_remainder():
    made = []

    def fn(i):
        made.append(i)
        return _ex(6 + (i % 3))

    loader = BucketedLoader(
        num_examples=10, make_example_fn=fn, batch_size=4, pad_idx=9,
        buckets=(16,), n_query=4, shuffle=True, seed=1, drop_remainder=True,
    )
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2 and all(b["features"].shape[0] == 4 for b in batches)
    assert len(set(made)) == 8  # two full batches, no duplicates

    loader2 = BucketedLoader(
        num_examples=10, make_example_fn=fn, batch_size=4, pad_idx=9,
        buckets=(16,), n_query=4, shuffle=False,
    )
    batches = list(loader2)
    assert [b["features"].shape[0] for b in batches] == [4, 4, 2]


def test_loader_length_grouping():
    lengths = [30, 5, 30, 5, 30, 5]
    loader = BucketedLoader(
        num_examples=6, make_example_fn=lambda i: _ex(lengths[i]),
        batch_size=2, pad_idx=9, buckets=(8, 32), n_query=4,
        shuffle=True, seed=0, example_lengths=lengths,
    )
    shapes = [b["features"].shape[1] for b in loader]
    # grouping by bucket: the three short examples batch together
    assert sorted(shapes) == [8, 32, 32]


def test_loader_propagates_worker_errors():
    """An exception in the prefetch worker must surface in the consumer,
    not silently truncate the epoch."""
    import pytest

    from r3d_tpu.data.pipeline import BucketedLoader

    def bad_example(i):
        if i == 3:
            raise ValueError("boom at example 3")
        import numpy as np

        from r3d_tpu.data.protocol import Example

        return Example(
            features=np.zeros((10, 4), np.float32),
            past_label=np.zeros((10,), np.int64),
            trans_future_target=np.zeros((8,), np.int64),
            trans_future_dur=np.zeros((8,), np.float32),
        )

    loader = BucketedLoader(
        num_examples=6, make_example_fn=bad_example, batch_size=2,
        pad_idx=9, buckets=(16,), n_query=8, shuffle=False,
    )
    with pytest.raises(ValueError, match="boom at example 3"):
        for _ in loader:
            pass


def test_query_pads_with_query_vocab_pad():
    """Integer query streams pad with the QUERY vocab's pad id, not the
    coarse pad_idx (reference collate pads with query_pad_idx=len(vocab),
    basedataset_proposed_50salads.py:198)."""
    import numpy as np

    from r3d_tpu.data.pipeline import pad_batch
    from r3d_tpu.data.protocol import Example

    def ex(n):
        return Example(
            features=np.zeros((n, 4), np.float32),
            past_label=np.zeros((n,), np.int64),
            trans_future_target=np.zeros((8,), np.int64),
            trans_future_dur=np.zeros((8,), np.float32),
            query_label=np.arange(n, dtype=np.int64) % 3,
        )

    batch = pad_batch([ex(10), ex(6)], pad_idx=11, buckets=(16,), n_query=8,
                      with_query=True, query_pad_idx=3)
    assert batch["query_label"][1, 6:].tolist() == [3] * 10
    assert batch["query_label"][0, :10].max() <= 2
    # fallback without an explicit query pad: coarse pad_idx (legacy)
    batch = pad_batch([ex(6)], pad_idx=11, buckets=(16,), n_query=8,
                      with_query=True)
    assert batch["query_label"][0, 6:].tolist() == [11] * 10
