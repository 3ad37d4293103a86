"""Serving session: checkpoint -> batched anticipation API."""

import numpy as np
import pytest

import jax

from test_datasets import disk_dataset, make_cfg  # noqa: F401
from test_predict import small_model_cfg
from r3d_tpu.config import get_config, TrainConfig
from r3d_tpu.data.datasets import build_loader, build_source
from r3d_tpu.serving import InferenceSession
from r3d_tpu.train.checkpoint import Checkpointer
from r3d_tpu.train.loop import Trainer


def test_drain_survives_racing_cancel():
    """A client cancelling between _drain's batch grouping and the
    set_result must not raise out of the drain thread (which would hang
    every later submit) — the set itself is guarded (advisor round-2 #2)."""
    from concurrent.futures import Future

    from r3d_tpu.serving import ServingQueue

    class StubSession:
        max_batch = 4

        def anticipate_batch(self, videos, future_len=None):
            return [{"ok": i} for i in range(len(videos))]

    q = ServingQueue.__new__(ServingQueue)  # no drain thread needed
    q.session = StubSession()

    f_cancelled, f_live = Future(), Future()
    f_cancelled.cancel()
    video = {"features": np.zeros((4, 2), np.float32)}
    q._drain([(video, None, f_cancelled), (video, None, f_live)])
    assert f_live.result(timeout=1) == {"ok": 1}
    assert f_cancelled.cancelled()

    # same race on the exception path
    class FailingSession(StubSession):
        def anticipate_batch(self, videos, future_len=None):
            raise ValueError("boom")

    q.session = FailingSession()
    f_cancelled2, f_live2 = Future(), Future()
    f_cancelled2.cancel()
    q._drain([(video, None, f_cancelled2), (video, None, f_live2)])
    with pytest.raises(ValueError):
        f_live2.result(timeout=1)


def test_session_from_checkpoint(disk_dataset, tmp_path):  # noqa: F811
    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0,
                          batch_size=4),
    )
    source = build_source(cfg.data, "train_split.txt")
    loader = build_loader(source, cfg.data, 4, cfg.model.n_query, mode="train")
    trainer = Trainer(cfg, source.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    Checkpointer(str(tmp_path)).save_best(state, seed=1, epoch=0)

    session = InferenceSession.from_checkpoint(
        cfg, str(tmp_path), seed=1, n_class=source.n_class, max_batch=4
    )
    v0 = source.load_video(source.vid_list[0])
    v1 = source.load_video(source.vid_list[1])
    res = session.anticipate_batch(
        [
            {"features": v0["features"][:30], "depth": v0["depth"][:30]},
            {"features": v1["features"][:20], "depth": v1["depth"][:20]},
        ],
        future_len=25,
    )
    assert len(res) == 2
    for r, n_obs in zip(res, (30, 20)):
        assert r["future_frames"].shape == (25,)
        assert r["transcript"].shape == (cfg.model.n_query,)
        assert r["seg"].shape == (n_obs,)
        assert np.all(r["future_frames"] >= 0)

    single = session.anticipate(v0["features"][:30], v0["depth"][:30],
                                future_len=25)
    np.testing.assert_array_equal(single["future_frames"], res[0]["future_frames"])

    # 5 videos at max_batch=4 -> chunks of 4 and 1; batch padding goes to
    # the next power of two per chunk, and every result must equal the
    # corresponding single-video call (eval-mode forward is batch-invariant)
    lens = (30, 20, 25, 18, 22)
    vids = [
        {"features": v0["features"][:n], "depth": v0["depth"][:n]}
        for n in lens
    ]
    res5 = session.anticipate_batch(vids, future_len=25)
    assert len(res5) == 5 and all(r is not None for r in res5)
    for v, r in zip(vids, res5):
        ref = session.anticipate(v["features"], v["depth"], future_len=25)
        np.testing.assert_array_equal(ref["transcript"], r["transcript"])
        np.testing.assert_array_equal(ref["future_frames"], r["future_frames"])

    # a video LONGER than the largest bucket truncates (like the training
    # pipeline) instead of crashing the padded write
    long_feats = np.concatenate([v0["features"]] * 3)[:70]
    long_depth = np.concatenate([v0["depth"]] * 3)[:70]
    r_long = session.anticipate(long_feats, long_depth, future_len=25)
    assert r_long["future_frames"].shape == (25,)
    assert r_long["seg"].shape[0] == 64  # bucket-truncated observed length

    # export -> load roundtrip: the deserialized StableHLO artifact (stored
    # params, no model code) must reproduce the live session exactly; a
    # non-power-of-two max_batch must still cover the padded batch shapes
    from r3d_tpu.serving import ExportedSession

    # concurrent batching front-end: submitted requests coalesce into
    # fewer anticipate_batch drains and return the exact per-video results
    from r3d_tpu.serving import ServingQueue

    drains = []
    orig = session.anticipate_batch

    def counting(videos_, future_len=None):
        drains.append(len(videos_))
        return orig(videos_, future_len)

    session.anticipate_batch = counting
    q = ServingQueue(session, max_wait_ms=200)
    futs = [q.submit(v["features"], v["depth"], 25) for v in vids]
    for f, want in zip(futs, res5):
        got = f.result(timeout=120)
        np.testing.assert_array_equal(got["future_frames"],
                                      want["future_frames"])
    q.close()
    session.anticipate_batch = orig
    assert sum(drains) == len(vids)
    assert len(drains) < len(vids)  # at least some coalescing happened

    # close() drains already-queued requests before stopping
    q2 = ServingQueue(session, max_wait_ms=1)
    futs2 = [q2.submit(v["features"], v["depth"], 25) for v in vids[:3]]
    q2.close()
    for f in futs2:
        assert f.result(timeout=60)["future_frames"].shape == (25,)

    # a cancelled future must not poison its groupmates' results
    q3 = ServingQueue(session, max_wait_ms=500)
    f_a = q3.submit(vids[0]["features"], vids[0]["depth"], 25)
    f_b = q3.submit(vids[1]["features"], vids[1]["depth"], 25)
    f_b.cancel()
    assert f_a.result(timeout=60)["future_frames"].shape == (25,)
    q3.close()

    session3 = InferenceSession(cfg, session.variables, source.n_class,
                                max_batch=3)
    art = str(tmp_path / "artifact")
    session3.export(art)
    served = ExportedSession.load(art)
    res_exp = served.anticipate_batch(vids, future_len=25)  # chunks of 3+2
    res_live = session3.anticipate_batch(vids, future_len=25)
    for a, b in zip(res_live, res_exp):
        np.testing.assert_array_equal(a["transcript"], b["transcript"])
        np.testing.assert_array_equal(a["future_frames"], b["future_frames"])
        np.testing.assert_array_equal(a["seg"], b["seg"])


def test_session_on_mesh_matches_single_device(disk_dataset, tmp_path):  # noqa: F811
    """InferenceSession(mesh=...): dp-sharded request batches + TP/EP param
    shardings produce the same decoded results as the plain session."""
    from r3d_tpu.parallel.mesh import make_mesh, set_active_mesh

    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0,
                          batch_size=4),
    )
    source = build_source(cfg.data, "train_split.txt")
    loader = build_loader(source, cfg.data, 4, cfg.model.n_query, mode="train")
    trainer = Trainer(cfg, source.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    v0 = source.load_video(source.vid_list[0])
    vids = [
        {"features": v0["features"][:n], "depth": v0["depth"][:n]}
        for n in (30, 20, 25)
    ]

    plain = InferenceSession(cfg, variables, source.n_class, max_batch=4)
    ref = plain.anticipate_batch(vids, future_len=25)

    try:
        mesh = make_mesh(dp=4, tp=2)
        sess = InferenceSession(
            cfg, variables, source.n_class, max_batch=4, mesh=mesh
        )
        out = sess.anticipate_batch(vids, future_len=25)
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(a["transcript"], b["transcript"])
            np.testing.assert_array_equal(a["future_frames"], b["future_frames"])
            np.testing.assert_allclose(a["seg"], b["seg"], atol=1e-5)
        with pytest.raises(ValueError, match="single-device"):
            sess.export(str(tmp_path / "exp"))
    finally:
        set_active_mesh(None)
