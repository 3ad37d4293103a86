"""On-disk dataset source (reference data/basedataset*.py family).

One loader class replaces the reference's 11 forked dataset files; the fork
points are DataConfig fields:

- ``gt_format``: 'plain' = one label per line (basedataset.py:57);
  'csv' = ``img,L2[,L3]`` rows, keep rows with exactly 3 fields
  (basedataset_utkinects.py:96-102).
- ``features_transposed``: breakfast/50salads store [C, S]
  (basedataset.py:53-54).
- ``train_obs_percs``: per-dataset observation-ratio replication.
- ``depth_features_dir``: optional second stream (utk/ntu/darai).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from r3d_tpu.config import DataConfig
from r3d_tpu.data.mapping import read_mapping_dict
from r3d_tpu.data.pipeline import BucketedLoader
from r3d_tpu.data.protocol import Example, make_example


def _dataset_dir(cfg: DataConfig) -> str:
    # main_utkinects.py:77-84: the 'utkinects' config lives in datasets/utkinect
    name = {"utkinects": "utkinect"}.get(cfg.dataset, cfg.dataset)
    return os.path.join(cfg.data_root, name)


def read_split(cfg: DataConfig, split_name: str) -> List[str]:
    path = os.path.join(_dataset_dir(cfg), cfg.splits_dir, split_name)
    with open(path) as f:
        return [l for l in f.read().split("\n") if l.strip()]


def read_gt_file(path: str, gt_format: str) -> Tuple[List[str], Optional[List[str]], Optional[List[str]]]:
    """Returns (frame_labels, image_paths, l3_labels)."""
    with open(path) as f:
        lines = f.readlines()
    if gt_format == "csv":
        valid = [l.strip() for l in lines if len(l.strip().split(",")) == 3]
        images = [l.split(",")[0] for l in valid]
        labels = [l.split(",")[1] for l in valid]
        l3 = [l.split(",")[2] for l in valid]
        return labels, images, l3
    labels = [l for l in "".join(lines).split("\n")][:-1]
    return labels, None, None


class VideoSource:
    """Lazy per-video loader + train-table expansion over observation ratios.

    Labels parse once per video into int arrays (the reference re-parses
    strings in every __getitem__, basedataset.py:133-137); feature arrays
    RAM-cache by default, or stream per-example through the native C++
    loader (``cache='native'``, r3d_tpu/data/native.py) for datasets larger
    than host memory.
    """

    def __init__(
        self,
        cfg: DataConfig,
        vid_list: List[str],
        actions_dict: Dict[str, int],
        n_class: int,
        pad_idx: int,
        query_dict: Optional[Dict[str, int]] = None,
        cache: str = "ram",      # ram | native
    ):
        self.cfg = cfg
        self.vid_list = vid_list
        self.actions_dict = actions_dict
        self.n_class = n_class
        self.pad_idx = pad_idx
        self.query_dict = query_dict
        self.cache = cache
        root = _dataset_dir(cfg)
        self.features_path = os.path.join(root, cfg.features_dir)
        self.gt_path = os.path.join(root, cfg.gt_dir)
        self.depth_path = (
            os.path.join(root, cfg.depth_features_dir)
            if cfg.depth_features_dir
            else None
        )
        self._cache: Dict[str, Dict] = {}
        self._meta: Dict[str, Dict] = {}

    def _feature_file(self, vid_file: str) -> str:
        return os.path.join(self.features_path, vid_file.split(".")[0] + ".npy")

    def _depth_file(self, vid_file: str) -> str:
        return os.path.join(self.depth_path, vid_file.split(".")[0] + ".npy")

    def load_meta(self, vid: str) -> Dict:
        """Parsed labels (int arrays) + paths; tiny, always cached."""
        vid_file = vid.split("/")[-1]
        if vid_file in self._meta:
            return self._meta[vid_file]
        labels, images, l3 = read_gt_file(
            os.path.join(self.gt_path, vid_file), self.cfg.gt_format
        )
        if self.cfg.l1_relabel:
            # proposed-50salads: L2 gt -> L1 targets, raw L2 rides as query
            from r3d_tpu.data.salads50 import relabel_sequence

            l3 = labels
            labels = relabel_sequence(labels)
        label_idx = np.array(
            [self.actions_dict[l.replace(" ", "")] for l in labels], np.int64
        )
        query_idx = None
        if self.query_dict is not None and l3 is not None:
            query_idx = np.array(
                [self.query_dict[q.replace(" ", "")] for q in l3], np.int64
            )
        if self.cfg.gaze_dir is not None:
            # gaze CSV -> normalized [S, 2] float query stream
            # (basedataset_darai_gaze.py:169-186)
            from r3d_tpu.data.preprocess.tools import gaze_csv_to_query

            gaze_path = os.path.join(
                _dataset_dir(self.cfg), self.cfg.gaze_dir,
                vid_file.split(".")[0] + ".csv",
            )
            query_idx = gaze_csv_to_query(gaze_path, len(labels))
        meta = {
            "labels": labels, "label_idx": label_idx, "images": images,
            "l3": l3, "query_idx": query_idx,
        }
        self._meta[vid_file] = meta
        return meta

    def load_video(self, vid: str) -> Dict:
        vid_file = vid.split("/")[-1]
        if vid_file in self._cache:
            return self._cache[vid_file]
        meta = self.load_meta(vid)
        feats = np.load(self._feature_file(vid_file))
        if self.cfg.features_transposed:
            feats = feats.T
        video = dict(meta, features=feats)
        if self.depth_path is not None:
            depth = np.load(self._depth_file(vid_file))
            if self.cfg.normalize_depth:
                # NTU: whole-stack min-max -> [0,255] uint8
                # (basedataset_nturgbd.py:42-52)
                lo, hi = depth.min(), depth.max()
                if hi > lo:
                    depth = (depth - lo) / (hi - lo) * 255
                depth = depth.astype(np.uint8)
            video["depth"] = depth
        if self.cache == "ram":
            self._cache[vid_file] = video
        return video

    def make_example(self, vid: str, obs_perc: float, sample_rate: int,
                     n_query: int) -> Example:
        vid_file = vid.split("/")[-1]
        if self.cache == "native":
            from r3d_tpu.data import native
            from r3d_tpu.data.protocol import make_example_from_indices

            meta = self.load_meta(vid)
            idx = meta["label_idx"]
            vid_len = len(idx)
            observed = int(obs_perc * vid_len)
            n_rows = -(-observed // sample_rate) if observed else 0
            shape = native.probe(self._feature_file(vid_file))
            if shape is not None and n_rows > 0:
                dims = shape[0]
                row_elems = (
                    dims[0] if self.cfg.features_transposed
                    else int(np.prod(dims[1:]))
                )
                res = native.load_sliced(
                    self._feature_file(vid_file), observed, sample_rate,
                    n_rows, row_elems, transpose=self.cfg.features_transposed,
                )
                if res is not None:
                    feats, n = res
                    depth = None
                    if self.depth_path is not None:
                        dshape = native.probe(self._depth_file(vid_file))
                        dres = (
                            native.load_sliced(
                                self._depth_file(vid_file), observed,
                                sample_rate, n_rows, int(np.prod(dshape[0][1:])),
                            )
                            if dshape is not None
                            else None
                        )
                        if dres is not None:
                            depth = dres[0].reshape(
                                (n_rows,) + tuple(dshape[0][1:])
                            )
                    return make_example_from_indices(
                        feats[:n], idx, obs_perc, sample_rate, n_query,
                        self.pad_idx, self.n_class,
                        depth_features=None if depth is None else depth[:n],
                        query_idx=meta["query_idx"], vid_name=vid,
                        features_presliced=True,
                    )
            # fall through to the numpy path on any native failure

        from r3d_tpu.data.protocol import make_example_from_indices

        v = self.load_video(vid)
        return make_example_from_indices(
            v["features"], v["label_idx"], obs_perc, sample_rate, n_query,
            self.pad_idx, self.n_class,
            depth_features=v.get("depth"), query_idx=v["query_idx"],
            vid_name=vid,
        )


def build_source(
    cfg: DataConfig, split_name: str, query_mapping: Optional[str] = None
) -> VideoSource:
    root = _dataset_dir(cfg)
    actions_dict = read_mapping_dict(os.path.join(root, cfg.mapping_file))
    n_class = len(actions_dict) + 1      # + NONE (main_utkinects.py:108)
    pad_idx = n_class + 1                # main_utkinects.py:109
    query_mapping = query_mapping or cfg.query_mapping_file
    query_dict = (
        read_mapping_dict(os.path.join(root, query_mapping)) if query_mapping else None
    )
    vids = read_split(cfg, split_name)
    return VideoSource(cfg, vids, actions_dict, n_class, pad_idx, query_dict)


def build_loader(
    source: VideoSource,
    cfg: DataConfig,
    batch_size: int,
    n_query: int,
    mode: str = "train",
    obs_perc: float = 0.2,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = False,
) -> BucketedLoader:
    obs = cfg.train_obs_percs if mode in ("train", "val") else (obs_perc,)
    table = [(v, o) for v in source.vid_list for o in obs]

    def fn(i: int) -> Example:
        vid, o = table[i]
        return source.make_example(vid, o, cfg.sample_rate, n_query)

    return BucketedLoader(
        num_examples=len(table),
        make_example_fn=fn,
        batch_size=batch_size,
        pad_idx=source.pad_idx,
        buckets=cfg.seq_buckets,
        n_query=n_query,
        with_depth=source.depth_path is not None,
        with_query=source.query_dict is not None or cfg.gaze_dir is not None,
        shuffle=shuffle,
        seed=seed,
        drop_remainder=drop_remainder,
    )
