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

    @staticmethod
    def _base(vid_file: str) -> str:
        return os.path.splitext(vid_file)[0]

    def _gt_file(self, vid_file: str, seq: Optional[int] = None) -> str:
        if seq is None:
            return os.path.join(self.gt_path, vid_file)
        return os.path.join(self.gt_path, f"{self._base(vid_file)}_{seq}.txt")

    def _feature_file(self, vid_file: str, seq: Optional[int] = None) -> str:
        base = vid_file.split(".")[0] if seq is None else f"{self._base(vid_file)}_{seq}"
        return os.path.join(self.features_path, base + ".npy")

    def _gaze_file(self, vid_file: str) -> str:
        # one gaze CSV per video id — the reference resolves the file from
        # each gt row's image path, but the path only encodes (activity,
        # video id), so the per-row existence check collapses to per-video
        # (basedataset_darai_gaze.py:97-109,152-156)
        return os.path.join(
            _dataset_dir(self.cfg), self.cfg.gaze_dir,
            vid_file.split(".")[0] + ".csv",
        )

    def _depth_file(self, vid_file: str, seq: Optional[int] = None) -> str:
        if seq is None and not self.cfg.multi_sequence:
            return os.path.join(self.depth_path, vid_file.split(".")[0] + ".npy")
        # multi-sequence: the depth stream is always the seq-1 file with the
        # camera->depth directory rewrite (basedataset_darai_depth.py:46-50)
        path = os.path.join(self.depth_path, f"{self._base(vid_file)}_1.npy")
        for old, new in self.cfg.depth_dir_rewrite:
            if old in path:
                path = path.replace(old, new)
                break
        return path

    def units(self) -> List[Tuple[str, Optional[int]]]:
        """The (vid, seq) pairs this source serves.

        Flat layouts: one unit per split entry.  Multi-sequence layouts
        (basedataset_darai_depth.py:44-82): walk {base}_{seq}.txt/.npy from
        seq=1 until a file is missing or the gt has <= sample_rate lines;
        a video with no (rewritten) depth file contributes nothing when a
        depth stream is configured.
        """
        def gaze_ok(vid_file: str) -> bool:
            # a video whose gaze CSV is missing yields zero valid gt rows in
            # the reference (per-row existence filter) — its items collate
            # away (basedataset_darai_gaze.py:152-158,270-281)
            return self.cfg.gaze_dir is None or os.path.exists(
                self._gaze_file(vid_file)
            )

        if not self.cfg.multi_sequence:
            return [
                (v, None) for v in self.vid_list if gaze_ok(v.split("/")[-1])
            ]
        out: List[Tuple[str, Optional[int]]] = []
        for vid in self.vid_list:
            vid_file = vid.split("/")[-1]
            depth_ok = self.depth_path is None or os.path.exists(
                self._depth_file(vid_file, seq=1)
            )
            if not (depth_ok and gaze_ok(vid_file)):
                continue
            seq = 1
            while True:
                gt = self._gt_file(vid_file, seq)
                feat = self._feature_file(vid_file, seq)
                if not (os.path.exists(gt) and os.path.exists(feat)):
                    break
                with open(gt) as f:
                    n_lines = len(f.readlines())
                if n_lines <= self.cfg.sample_rate:
                    break
                out.append((vid, seq))
                seq += 1
        return out

    @staticmethod
    def _meta_key(vid_file: str, seq: Optional[int]) -> str:
        return vid_file if seq is None else f"{vid_file}::{seq}"

    def load_meta(self, vid: str, seq: Optional[int] = None) -> Dict:
        """Parsed labels (int arrays) + paths; tiny, always cached."""
        vid_file = vid.split("/")[-1]
        key = self._meta_key(vid_file, seq)
        if key in self._meta:
            return self._meta[key]
        labels, images, l3 = read_gt_file(
            self._gt_file(vid_file, seq), self.cfg.gt_format
        )
        if self.cfg.label_from_filename:
            # proposed-breakfast: gt content = fine-grained query stream;
            # the target activity comes from the filename
            # (basedataset_proposed_breakfast.py:60-66)
            l3 = labels
            activity = self._base(vid_file).split("_")[-1]
            labels = [activity] * len(l3)
        elif self.cfg.l1_relabel:
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
            # gaze CSV -> min-max-normalized [N, 2] float stream; N is the
            # RAW gaze sample count, unrelated to the frame count, and the
            # observation window slices this stream directly
            # (basedataset_darai_gaze.py:169-188)
            from r3d_tpu.data.preprocess.tools import gaze_csv_to_query

            query_idx = gaze_csv_to_query(self._gaze_file(vid_file))
        meta = {
            "labels": labels, "label_idx": label_idx, "images": images,
            "l3": l3, "query_idx": query_idx,
        }
        self._meta[key] = meta
        return meta

    def _load_raw_video(self, vid_file: str, meta: Dict) -> Dict:
        """Raw-frame ablation (basedataset_utkinects_raw.py:80-104): jpgs
        sorted by their embedded number -> resize -> /255; depth from one
        Kinect XML per frame."""
        import re

        import cv2

        from r3d_tpu.data.preprocess.depth import kinect_xml_to_depth

        num = lambda s: int(re.search(r"\d+", s).group())
        base = self._base(vid_file)
        img_folder = os.path.join(self.features_path, base)
        frames = []
        for f in sorted(
            (f for f in os.listdir(img_folder) if f.endswith(".jpg")), key=num
        ):
            img = cv2.imread(os.path.join(img_folder, f), cv2.IMREAD_COLOR)
            img = cv2.resize(img, tuple(self.cfg.raw_frame_wh))
            frames.append(img / 255.0)
        video = dict(meta, features=np.array(frames, np.float32))
        if self.depth_path is not None:
            depth_folder = os.path.join(self.depth_path, base)

            def load_depth(f):
                d = kinect_xml_to_depth(os.path.join(depth_folder, f))
                h, w = d.shape
                # the reference passes (h/2, w/2) as cv2's (width, height)
                # dsize — an axis swap it ships with; reproduced exactly
                # (basedataset_utkinects_raw.py:66-70, COMPAT.md)
                d = cv2.resize(d, (int(h / 2), int(w / 2)))
                d = cv2.normalize(d, None, 0, 255, cv2.NORM_MINMAX)
                return np.uint8(d)

            depth = [
                load_depth(f)
                for f in sorted(
                    (f for f in os.listdir(depth_folder) if f.endswith(".xml")),
                    key=num,
                )
            ]
            video["depth"] = np.array(depth, np.float32)
        return video

    def load_video(self, vid: str, seq: Optional[int] = None) -> Dict:
        vid_file = vid.split("/")[-1]
        key = self._meta_key(vid_file, seq)
        if key in self._cache:
            return self._cache[key]
        meta = self.load_meta(vid, seq)
        if self.cfg.raw_frames:
            video = self._load_raw_video(vid_file, meta)
            if self.cache == "ram":
                self._cache[key] = video
            return video
        feats = np.load(self._feature_file(vid_file, seq))
        if self.cfg.features_transposed:
            feats = feats.T
        video = dict(meta, features=feats)
        if self.depth_path is not None:
            depth = np.load(self._depth_file(vid_file, seq))
            if self.cfg.multi_sequence and meta["images"]:
                # align the whole-video depth stack to this sequence's frame
                # window by the gt's image indices
                # (basedataset_darai_depth.py:105-113)
                idxs = [
                    int(os.path.basename(p).split("_")[-1].split(".")[0])
                    for p in meta["images"]
                ]
                depth = depth[idxs[0] : idxs[-1] + 1]
            if self.cfg.normalize_depth:
                # NTU: whole-stack min-max -> [0,255] uint8
                # (basedataset_nturgbd.py:42-52)
                lo, hi = depth.min(), depth.max()
                if hi > lo:
                    depth = (depth - lo) / (hi - lo) * 255
                depth = depth.astype(np.uint8)
            video["depth"] = depth
        if self.cache == "ram":
            self._cache[key] = video
        return video

    def _gaze_window(self, ex: Example, query_idx: np.ndarray,
                     obs_perc: float) -> Example:
        """Gaze query stream: the observation window slices the RAW gaze
        stream by ``int(obs_perc * N_gaze)`` — no sample_rate subsampling,
        length unrelated to the frame count (basedataset_darai_gaze.py:
        186-188)."""
        ex.query_label = query_idx[: int(obs_perc * len(query_idx))]
        return ex

    def make_example(self, vid: str, obs_perc: float, sample_rate: int,
                     n_query: int, seq: Optional[int] = None) -> Example:
        vid_file = vid.split("/")[-1]
        is_gaze = self.cfg.gaze_dir is not None
        if (self.cache == "native" and seq is None
                and not self.cfg.multi_sequence and not self.cfg.raw_frames):
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
                    ex = make_example_from_indices(
                        feats[:n], idx, obs_perc, sample_rate, n_query,
                        self.pad_idx, self.n_class,
                        depth_features=None if depth is None else depth[:n],
                        query_idx=None if is_gaze else meta["query_idx"],
                        vid_name=vid,
                        features_presliced=True,
                        future_frames=self.cfg.future_frames,
                    )
                    if is_gaze:
                        ex = self._gaze_window(ex, meta["query_idx"], obs_perc)
                    return ex
            # fall through to the numpy path on any native failure

        from r3d_tpu.data.protocol import make_example_from_indices

        v = self.load_video(vid, seq)
        ex = make_example_from_indices(
            v["features"], v["label_idx"], obs_perc, sample_rate, n_query,
            self.pad_idx, self.n_class,
            depth_features=v.get("depth"),
            query_idx=None if is_gaze else v["query_idx"],
            vid_name=vid if seq is None else f"{vid}::{seq}",
            future_frames=self.cfg.future_frames,
        )
        if is_gaze:
            ex = self._gaze_window(ex, v["query_idx"], obs_perc)
        return ex


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
    table = [(u, o) for u in source.units() for o in obs]

    def fn(i: int) -> Example:
        (vid, seq), o = table[i]
        return source.make_example(vid, o, cfg.sample_rate, n_query, seq=seq)

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
        feature_dtype=cfg.feature_dtype,
        # query streams pad with the QUERY vocab's pad id (reference
        # query_pad_idx = len(query_dict), e.g. 48 for the 48-class
        # mapping.txt, basedataset_proposed_breakfast.py:16) — the coarse
        # pad_idx is a valid fine-action id
        query_pad_idx=(
            len(source.query_dict) if source.query_dict is not None else None
        ),
        query_pad_len=cfg.gaze_pad_len,
    )
