"""One-command guarded dry run of the FULL real-CLEVR pipeline.

The real CLEVR dataset is absent in this environment (zero egress,
DATA_NOTES.md), so the parity runbook (TODO.md) has been prose. This
makes it executable: the moment a CLEVR checkout appears at
--dataset_dir (standard layout: questions/CLEVR_<split>_questions.json,
images/<split>/*.png), this runs every stage end-to-end on a --limit
subset:

  1. expert-layout extraction (functional program -> RPN modules;
     reference exp_clevr/data/get_ground_truth_layout.py)
  2. on-device VGG-16 pool5 feature extraction (reference
     extract_visual_features_vgg_pool5.py; random-init weights unless
     --vgg_weights is given — the dry run validates PLUMBING, accuracy
     needs converted weights)
  3. imdb build (reference build_clevr_imdb.py)
  4. --train_iters cloning steps through the standard trainer
  5. greedy eval on the val subset

tests/test_real_data_dryrun.py runs this under pytest, skipped unless
the dataset directory exists — so the full parity run is a one-command
event when data lands:

  python -m n2nmn_tpu.tools.clevr_dryrun --dataset_dir <CLEVR_v1.0> \
      --vgg_weights vgg16.pth [--limit 256]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def _truncate_questions(question_file, out_file, limit):
    """Copy the first `limit` questions (and only them) to out_file."""
    with open(question_file) as f:
        payload = json.load(f)
    payload["questions"] = payload["questions"][:limit]
    image_files = sorted({q["image_filename"]
                          for q in payload["questions"]})
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    with open(out_file, "w") as f:
        json.dump(payload, f)
    return image_files


def _extract_features(image_dir, image_files, out_dir, vgg_params,
                      batch_size=16):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from n2nmn_tpu.models.backbones import vgg16_pool5

    H_IMG, W_IMG = 320, 480   # reference resize (vgg_net.py usage)

    @jax.jit
    def extract(batch_bgr):
        return vgg16_pool5(vgg_params, batch_bgr)

    os.makedirs(out_dir, exist_ok=True)
    for i in range(0, len(image_files), batch_size):
        chunk = image_files[i:i + batch_size]
        imgs = []
        for fn in chunk:
            im = Image.open(os.path.join(image_dir, fn)).convert(
                "RGB").resize((W_IMG, H_IMG))
            imgs.append(np.asarray(im, np.float32)[:, :, ::-1])
        feats = np.asarray(extract(jnp.asarray(np.stack(imgs))),
                           np.float32)
        for fn, feat in zip(chunk, feats):
            np.save(os.path.join(out_dir, fn.rsplit(".", 1)[0] + ".npy"),
                    feat[None])


def run_dryrun(dataset_dir, work_dir="./exp_clevr_dryrun", limit=256,
               train_iters=100, vgg_weights=None, batch_size=16):
    from n2nmn_tpu.data.builders.clevr_layouts import add_gt_layout
    from n2nmn_tpu.data.builders.clevr_imdb import build_imdb, save_imdb
    from n2nmn_tpu.experiments import clevr

    os.makedirs(os.path.join(work_dir, "data", "imdb"), exist_ok=True)
    # the standard vocab/answer files ship in-repo
    import shutil
    src_data = os.path.join(os.path.dirname(__file__), "..", "..",
                            "exp_clevr", "data")
    for fn in ("vocabulary_clevr.txt", "answers_clevr.txt",
               "vocabulary_layout.txt"):
        shutil.copy(os.path.join(src_data, fn),
                    os.path.join(work_dir, "data", fn))

    # VGG weights: converted if provided, else random-init (plumbing-only)
    import jax
    from n2nmn_tpu.models import backbones, vgg_convert
    if vgg_weights and vgg_weights.endswith(".npz"):
        vgg_params = vgg_convert.from_npz(vgg_weights)
        weights_kind = vgg_weights
    elif vgg_weights:
        vgg_params = vgg_convert.from_torchvision_file(vgg_weights)
        weights_kind = vgg_weights
    else:
        vgg_params = backbones.init_vgg16(jax.random.PRNGKey(0))
        weights_kind = "RANDOM-INIT (plumbing dry run only)"
    print(f"VGG-16 weights: {weights_kind}")

    stages = []
    for split, tag in (("train", "trn"), ("val", "val")):
        qf = os.path.join(dataset_dir, "questions",
                          f"CLEVR_{split}_questions.json")
        assert os.path.exists(qf), qf
        sub_qf = os.path.join(work_dir, "data",
                              f"CLEVR_{split}_questions.json")
        image_files = _truncate_questions(qf, sub_qf, limit)
        print(f"[{split}] {limit} questions / {len(image_files)} images")

        gt_qf = os.path.join(work_dir, "data",
                             f"CLEVR_{split}_questions_gt_layout.json")
        add_gt_layout(sub_qf, gt_qf)          # stage 1
        feat_dir = os.path.join(work_dir, "features", split)
        _extract_features(os.path.join(dataset_dir, "images", split),
                          image_files, feat_dir, vgg_params,
                          batch_size)         # stage 2
        imdb = build_imdb(gt_qf, os.path.join(dataset_dir, "images",
                                              split), feat_dir)
        save_imdb(imdb, os.path.join(work_dir, "data", "imdb",
                                     f"imdb_{tag}.npy"))   # stage 3
        stages.append((split, len(imdb)))

    # stage 4: cloning steps through the standard trainer
    cfg = clevr.ClevrConfig(
        exp_name="dryrun_gt_layout", root=work_dir, seed=0,
        max_iter=train_iters, snapshot_interval=train_iters,
        N=min(64, limit))
    clevr.train(cfg)

    # stage 5: greedy eval on the val subset
    ecfg = clevr.ClevrConfig(root=work_dir, N=min(64, limit))
    res = clevr.evaluate(ecfg, "dryrun_gt_layout",
                         f"{train_iters:08d}", "val")
    print("dry run complete:", json.dumps(
        {"stages": stages, "eval": {k: v for k, v in res.items()
                                    if not isinstance(v, dict)}}))
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", default="./exp_clevr/clevr-dataset")
    p.add_argument("--work_dir", default="./exp_clevr_dryrun")
    p.add_argument("--limit", type=int, default=256)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--vgg_weights", default=None)
    args = p.parse_args()
    run_dryrun(args.dataset_dir, args.work_dir, args.limit,
               args.train_iters, args.vgg_weights)
