"""imdb-based data pipeline for CLEVR (and the base for VQA).

Keeps the reference's on-disk contract — an ``imdb_*.npy`` array of dicts
with question_tokens / feature_path / answer / gt_layout_tokens
(reference util/clevr_train/data_reader.py, exp_clevr/data/
build_clevr_imdb.py:13-52) — and its prefetch design (daemon thread +
bounded queue, data_reader.py:102-107), with two TPU-oriented upgrades:

1. **Fixed-size padded batches** (+ ``weight`` mask) so every training
   step hits the same compiled XLA program; the reference emitted ragged
   final batches.
2. **Packed feature store**: instead of one ``np.load`` per example per
   batch (the reference's disk hot path — 29 GB of per-image .npy for
   CLEVR), features can be packed into a single memory-mapped array
   indexed by row (see pack_features), turning the hot path into mmap
   gathers. Falls back to per-file loading for reference-format imdbs.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

from n2nmn_tpu.data.text import VocabDict


class _PrefetchError:
    """Exception wrapper passed through the prefetch queue so loader
    errors surface in the consumer instead of deadlocking it."""

    def __init__(self, exc):
        self.exc = exc


def prune_filter_modules(gt_layout_tokens):
    """Collapse consecutive {_Filter,_Find}+_Filter chains to one module
    (reference clevr_train/data_reader.py:65-71)."""
    toks = list(gt_layout_tokens)
    for n_t in range(len(toks) - 1, 0, -1):
        if toks[n_t - 1] in {"_Filter", "_Find"} and toks[n_t] == "_Filter":
            toks[n_t] = None
    return [t for t in toks if t]


class FeatureSource:
    """Per-example feature access: packed store (native mmap gather when
    the C++ library is built — n2nmn_tpu/native/io.py) or per-file .npy
    (native parallel reader with numpy fallback)."""

    def __init__(self, imdb, packed_feature_file=None, num_threads=8):
        from n2nmn_tpu.native import io as native_io
        self._native_io = native_io
        self.num_threads = num_threads
        self.store = None
        self.row_of = None
        if packed_feature_file and os.path.exists(packed_feature_file):
            self.store = native_io.PackedStore(packed_feature_file,
                                               num_threads=num_threads)
            # row index: either 'feature_idx' in imdb or insertion order of
            # unique feature paths
            if "feature_idx" in imdb[0]:
                self.row_of = None  # direct index per record
            else:
                paths = {}
                for rec in imdb:
                    paths.setdefault(rec["feature_path"], len(paths))
                self.row_of = paths
            shape_probe = np.load(packed_feature_file, mmap_mode="r")
            self.feat_shape = shape_probe.shape[1:]
        else:
            feats = np.load(imdb[0]["feature_path"])
            self.feat_shape = feats.shape[1:] if feats.ndim == 4 \
                else feats.shape

    def _row_idx(self, rec):
        return (rec["feature_idx"] if self.row_of is None
                else self.row_of[rec["feature_path"]])

    def get(self, rec):
        if self.store is not None:
            return self.store.gather([self._row_idx(rec)]).reshape(
                self.feat_shape)
        feats = np.load(rec["feature_path"])
        return feats[0] if feats.ndim == 4 else feats

    def get_batch(self, recs, out):
        """Fill out[:len(recs)] with the records' features (batch-level
        native IO: one parallel gather / parallel file read)."""
        n = len(recs)
        flat = out[:n].reshape(n, -1)
        if self.store is not None:
            self.store.gather([self._row_idx(r) for r in recs], out=flat)
        else:
            self._native_io.load_npy_batch(
                [r["feature_path"] for r in recs],
                int(np.prod(self.feat_shape)), out=flat,
                num_threads=self.num_threads)
        return out


class RawImageSource:
    """Per-example RAW image access for the end-to-end image->answer mode
    (in-graph VGG pool5; replaces the reference's offline 29 GB feature
    dump, exp_clevr/data/extract_visual_features_vgg_pool5.py:23-55).

    color="bgr255" emits [H, W, 3] float32 0-255 BGR — the layout the
    reference feeds its VGG (vgg_net.py:16-20; its extractor reads RGB
    and flips to BGR). color="rgb01" emits RGB in [0, 1] (the ResNet-152
    convention, models/resnet.py). Supports .npy image files (assumed
    already in the requested convention) and standard image formats via
    PIL.
    """

    def __init__(self, imdb, image_shape, color="bgr255"):
        assert color in ("bgr255", "rgb01")
        self.color = color
        self.feat_shape = tuple(image_shape) + (3,)

    def _load(self, path):
        h, w, _ = self.feat_shape
        if path.endswith(".npy"):
            img = np.load(path).astype(np.float32)
            if img.shape[:2] != (h, w):
                raise ValueError(
                    f".npy image {path} is {img.shape[:2]}, expected "
                    f"{(h, w)} (no resize for pre-converted arrays)")
            return img
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGB")
            if im.size != (w, h):
                im = im.resize((w, h))
            img = np.asarray(im, np.float32)
        if self.color == "bgr255":
            return img[:, :, ::-1]   # RGB -> BGR, 0-255
        return img / 255.0           # RGB, [0, 1]

    def get_batch(self, recs, out):
        for n, rec in enumerate(recs):
            out[n] = self._load(rec["image_path"])
        return out


class BatchLoader:
    """Assembles one padded batch from imdb records (CLEVR flavor)."""

    def __init__(self, imdb, vocab_question_file, vocab_answer_file,
                 T_encoder, T_decoder=None, grammar=None,
                 prune_filter_module=False, load_gt_layout=None,
                 packed_feature_file=None, batch_size=None,
                 raw_images=False, image_shape=(320, 480)):
        self.imdb = imdb
        self.vocab_dict = VocabDict(vocab_question_file)
        self.answer_dict = VocabDict(vocab_answer_file)
        self.T_encoder = T_encoder
        self.T_decoder = T_decoder
        self.grammar = grammar
        self.prune_filter_module = prune_filter_module
        self.batch_size = batch_size

        rec0 = imdb[0]
        self.load_answer = rec0.get("answer") is not None
        self.load_gt_layout = (
            load_gt_layout if load_gt_layout is not None
            else rec0.get("gt_layout_tokens") is not None)
        if raw_images:
            self.features = RawImageSource(imdb, image_shape)
        else:
            self.features = FeatureSource(imdb, packed_feature_file)
        self.feat_H, self.feat_W, self.feat_D = self.features.feat_shape

    def load_one_batch(self, sample_ids):
        n_real = len(sample_ids)
        N = self.batch_size or n_real
        T = self.T_encoder
        batch = {
            "text_seq": np.zeros((T, N), np.int32),
            "seq_length": np.ones(N, np.int32),
            "image": np.zeros((N, self.feat_H, self.feat_W, self.feat_D),
                              np.float32),
            "weight": (np.arange(N) < n_real).astype(np.float32),
            "image_path": [None] * n_real,
        }
        if self.load_answer:
            batch["label"] = np.zeros(N, np.int32)
        if self.load_gt_layout:
            batch["gt_layout"] = np.full((self.T_decoder, N),
                                         self.grammar.eos_idx, np.int32)

        recs = [self.imdb[sid] for sid in sample_ids]
        self.features.get_batch(recs, batch["image"])
        for n, rec in enumerate(recs):
            inds = [self.vocab_dict.word2idx(w)
                    for w in rec["question_tokens"]]
            batch["text_seq"][:len(inds), n] = inds
            batch["seq_length"][n] = len(inds)
            batch["image_path"][n] = rec.get("image_path")
            if self.load_answer:
                batch["label"][n] = self.answer_dict.word2idx(rec["answer"])
            if self.load_gt_layout:
                toks = rec["gt_layout_tokens"]
                if self.prune_filter_module:
                    toks = prune_filter_modules(toks)
                batch["gt_layout"][:, n] = self.grammar.module_list2tokens(
                    toks, self.T_decoder)
        batch["n_real"] = n_real
        return batch


class DataReader:
    """Threaded prefetching batch stream (reference DataReader surface:
    .batches() generator, shuffle/one_pass semantics)."""

    def __init__(self, imdb_file, shuffle=True, one_pass=False,
                 prefetch_num=8, batch_size=64,
                 seed=None, **loader_kwargs):
        if isinstance(imdb_file, str):
            imdb = np.load(imdb_file, allow_pickle=True)
        else:
            imdb = imdb_file
        self.imdb = imdb
        self.shuffle = shuffle
        self.one_pass = one_pass
        self.batch_size = batch_size
        self.batch_loader = BatchLoader(imdb, batch_size=batch_size,
                                        **loader_kwargs)
        self._rng = np.random.RandomState(seed)
        self.prefetch_queue = queue.Queue(maxsize=prefetch_num)
        self._thread = threading.Thread(target=self._run_prefetch,
                                        daemon=True)
        self._thread.start()

    def _run_prefetch(self):
        try:
            num_samples = len(self.imdb)
            n_sample = 0
            fetch_order = np.arange(num_samples)
            while True:
                if n_sample == 0 and self.shuffle:
                    fetch_order = self._rng.permutation(num_samples)
                sample_ids = fetch_order[n_sample:n_sample
                                         + self.batch_size]
                batch = self.batch_loader.load_one_batch(sample_ids)
                self.prefetch_queue.put(batch, block=True)
                n_sample += len(sample_ids)
                if n_sample >= num_samples:
                    if self.one_pass:
                        self.prefetch_queue.put(None, block=True)
                        return
                    n_sample = 0
        except BaseException as e:  # propagate to the consumer, never hang
            self.prefetch_queue.put(_PrefetchError(e), block=True)

    def batches(self):
        while True:
            batch = self.prefetch_queue.get(block=True)
            if isinstance(batch, _PrefetchError):
                raise batch.exc
            if batch is None:
                assert self.one_pass
                return
            yield batch


def pack_features(imdb, out_file, dtype=np.float32):
    """Convert per-image feature .npy files into one packed array +
    feature_idx annotations on the imdb records. Returns updated imdb."""
    paths = {}
    for rec in imdb:
        paths.setdefault(rec["feature_path"], len(paths))
    first = np.load(next(iter(paths)))
    shape = first.shape[1:] if first.ndim == 4 else first.shape
    packed = np.zeros((len(paths),) + shape, dtype)
    for path, idx in paths.items():
        feats = np.load(path)
        packed[idx] = feats[0] if feats.ndim == 4 else feats
    np.save(out_file, packed)
    for rec in imdb:
        rec["feature_idx"] = paths[rec["feature_path"]]
    return imdb
