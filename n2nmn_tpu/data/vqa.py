"""VQA data pipeline (reference util/vqa_train/data_reader.py) on top of
the shared imdb machinery. Extras over the CLEVR loader:

- per-iteration uniform sampling of one answer from each question's 10
  human answers (reference :106-109);
- optional binary multi-label answer vector (:35-40, 110-112);
- optional ground-truth text-attention supervision [T_dec, T_enc, N]
  (:25-27, 88-89, 133-138);
- ``overriding_layout`` forcing one layout for every question (:41-49);
- ``use_count_module``: rewrite the final _Describe to _Count for
  "how many" questions (:60-65, 118-122);
- qid/qstr passthrough for VQA-server submission files (:77-78, 144).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from n2nmn_tpu.data.text import VocabDict
from n2nmn_tpu.data.imdb import FeatureSource, _PrefetchError


class VqaBatchLoader:
    def __init__(self, imdb, vocab_question_file, vocab_answer_file,
                 T_encoder, T_decoder=None, grammar=None,
                 load_gt_layout=None, load_gt_txtatt=None,
                 load_binary_labels=False, overriding_layout=None,
                 use_count_module=False, packed_feature_file=None,
                 batch_size=None, answer_seed=None,
                 raw_images=False, image_shape=(448, 448)):
        self.imdb = imdb
        self.vocab_dict = VocabDict(vocab_question_file)
        self.answer_dict = VocabDict(vocab_answer_file)
        self.num_choices = self.answer_dict.num_vocab
        self.T_encoder = T_encoder
        self.T_decoder = T_decoder
        self.grammar = grammar
        self.batch_size = batch_size
        self._rng = np.random.RandomState(answer_seed)

        rec0 = imdb[0]
        self.load_answer = rec0.get("valid_answers") is not None
        self.load_gt_layout = (
            load_gt_layout if load_gt_layout is not None
            else rec0.get("gt_layout_tokens") is not None)
        self.load_gt_txtatt = (
            load_gt_txtatt if load_gt_txtatt is not None
            else rec0.get("gt_txtatt") is not None)
        self.load_binary_labels = load_binary_labels
        self.overriding_layout = overriding_layout
        if overriding_layout is not None:
            self.load_gt_layout = True
            self.load_gt_txtatt = False
        self.use_count_module = use_count_module
        if raw_images:
            # end-to-end image->answer (in-graph ResNet-152 res5c): RGB
            # [0,1] raw images instead of the 307 GB offline feature dump
            from n2nmn_tpu.data.imdb import RawImageSource
            self.features = RawImageSource(imdb, image_shape,
                                           color="rgb01")
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
            "qid": [None] * n_real,
            "qstr": [None] * n_real,
            "n_real": n_real,
        }
        if self.load_answer:
            batch["label"] = np.zeros(N, np.int32)
            batch["valid_answers"] = [None] * n_real
            batch["all_answers"] = [None] * n_real
            if self.load_binary_labels:
                batch["binary_label"] = np.zeros((N, self.num_choices),
                                                 np.float32)
        if self.load_gt_layout:
            batch["gt_layout"] = np.full((self.T_decoder, N),
                                         self.grammar.eos_idx, np.int32)
        if self.load_gt_txtatt:
            batch["gt_txtatt"] = np.zeros((self.T_decoder, T, N), bool)

        recs = [self.imdb[sid] for sid in sample_ids]
        self.features.get_batch(recs, batch["image"])
        for n, rec in enumerate(recs):
            inds = [self.vocab_dict.word2idx(w)
                    for w in rec["question_tokens"]]
            batch["text_seq"][:len(inds), n] = inds
            batch["seq_length"][n] = len(inds)
            batch["image_path"][n] = rec.get("image_path")
            batch["qid"][n] = rec.get("question_id")
            batch["qstr"][n] = rec.get("question_str")
            if self.load_answer:
                valid_answers = rec["valid_answers"]
                batch["valid_answers"][n] = valid_answers
                batch["all_answers"][n] = rec.get("all_answers",
                                                  valid_answers)
                answer = valid_answers[
                    self._rng.randint(len(valid_answers))]
                batch["label"][n] = self.answer_dict.word2idx(answer)
                if self.load_binary_labels:
                    for a in valid_answers:
                        batch["binary_label"][
                            n, self.answer_dict.word2idx(a)] = 1.0
            if self.load_gt_layout:
                if self.overriding_layout is not None:
                    toks = self.overriding_layout
                else:
                    toks = list(rec["gt_layout_tokens"])
                    if self.use_count_module and (
                            "how many" in rec["question_str"].lower()):
                        assert toks[-1] == "_Describe"
                        toks[-1] = "_Count"
                batch["gt_layout"][:, n] = self.grammar.module_list2tokens(
                    toks, self.T_decoder)
            if self.load_gt_txtatt:
                for t_dec, ind in enumerate(rec["gt_txtatt"]):
                    if ind is not None:
                        t0, t1 = ind
                        batch["gt_txtatt"][t_dec, t0:t1, n] = True
        return batch


class VqaDataReader:
    """Threaded prefetching stream, same surface as the CLEVR reader."""

    def __init__(self, imdb_file, shuffle=True, one_pass=False,
                 prefetch_num=8, batch_size=64, seed=None, **loader_kwargs):
        imdb = (np.load(imdb_file, allow_pickle=True)
                if isinstance(imdb_file, str) else imdb_file)
        self.imdb = imdb
        self.shuffle = shuffle
        self.one_pass = one_pass
        self.batch_size = batch_size
        self.batch_loader = VqaBatchLoader(imdb, batch_size=batch_size,
                                           answer_seed=seed,
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
        except BaseException as e:
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
