"""End-to-end CLI drive of the gaze modality (config ``darai_gaze``).

The reference runs this path by comment-toggling main_darai.py:19,34
(basedataset_darai_gaze + futr_unsupervised_multimodal); its committed test
mode and unsupervised-loop pairing both crash (COMPAT #32), so end-to-end
coverage here is the runnable semantics: train through ``cli.run.train``
(host loader — the device cache declines gaze streams) and sweep MoC through
``cli.run.predict`` with the raw-gaze observation windows.
"""

import dataclasses
import os

import numpy as np

from r3d_tpu.config import CONFIGS


def _build_tree(tmp_path, n_videos=3):
    root = tmp_path / "darai"
    rng = np.random.RandomState(7)
    acts = [f"act{i}" for i in range(5)]
    for d in ["features_img", "groundTruth", "splits", "gaze"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts))
    )
    vids = []
    for v in range(n_videos):
        base = f"v{v}"
        for seq, L in ((1, 44), (2, 36)):
            labels = [acts[int(x)] for x in (np.arange(L) // 9) % 5]
            np.save(root / "features_img" / f"{base}_{seq}.npy",
                    rng.randn(L, 12).astype(np.float32))
            with open(root / "groundTruth" / f"{base}_{seq}.txt", "w") as f:
                for t, l in enumerate(labels):
                    f.write(f"img{t},{l},q{t % 3}\n")
        # raw gaze stream: length unrelated to the frame count
        n_gaze = int(rng.randint(50, 90))
        with open(root / "gaze" / f"{base}.csv", "w") as f:
            f.write("frame, gaze_x [px], gaze_y [px]\n")
            for i in range(n_gaze):
                f.write(f"{i}, {rng.rand() * 640}, {rng.rand() * 480}\n")
        vids.append(f"{base}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    (root / "splits" / "val_split.txt").write_text(vids[0] + "\n")
    return root


def test_gaze_cli_train_predict(tmp_path):
    from r3d_tpu.cli.run import predict as cli_predict
    from r3d_tpu.cli.run import train as cli_train

    _build_tree(tmp_path)
    cfg = CONFIGS["darai_gaze"]
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, data_root=str(tmp_path), seq_buckets=(64,),
            sample_rate=2, train_obs_percs=(0.3, 0.5), gaze_pad_len=96,
        ),
        model=dataclasses.replace(
            cfg.model, hidden_dim=16, n_head=2, n_encoder_layers=1,
            n_decoder_layers=1, n_query=8, input_dim=12, max_pos_len=64,
            compute_dtype="float32",
        ),
        train=dataclasses.replace(
            cfg.train, epochs=2, batch_size=8, min_train_batch=0,
            save_dir=str(tmp_path / "save"), seeds=(1,),
        ),
        eval=dataclasses.replace(
            cfg.eval, obs_percs=(0.2, 0.3), exclude_class_idx=None,
        ),
    )
    logs = []
    cli_train(cfg, seed=1, log=logs.append)
    assert any("Epoch" in s for s in logs), logs
    # the device cache must have declined the gaze stream (raw-gaze windows
    # have no in-step gather), leaving the host loader in charge
    assert not any("device cache:" in s for s in logs), logs

    results = cli_predict(cfg, log=logs.append)
    assert set(results) == {"obs0.2", "obs0.3"}
    for obs, metrics in results.items():
        assert any(
            "_pred" in k for k in metrics
        ) and "ant_acc" in metrics and "seg_acc" in metrics, (obs, metrics)
        for k, val in metrics.items():
            assert np.isfinite(val), (obs, k, val)
