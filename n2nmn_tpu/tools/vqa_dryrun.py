"""One-command guarded dry run of the FULL real-VQA pipeline.

The real VQA/COCO dataset is absent in this environment (zero egress,
DATA_NOTES.md), so the VQA parity runbook has been prose. This makes it
executable — the moment a VQA checkout appears at --dataset_dir, every
stage runs end-to-end on a --limit subset:

  1. Stanford-parse -> expert layouts for the split's qids
     (data/builders/vqa_layouts.py; reference
     exp_vqa/data/convert_new_parse_to_gt_layout.ipynb)
  2. on-device ResNet-152 res5c feature extraction (reference consumes a
     307 GB offline dump, README.md:121; random-init weights unless
     --resnet_weights is given — the dry run validates PLUMBING,
     accuracy needs converted weights)
  3. imdb build (reference exp_vqa/data/build_vqa_imdb.py)
  4. --train_iters cloning steps (qpn on, per-iteration answer sampling)
     through the standard exp_vqa trainer
  5. greedy eval on the val subset: layout stats, VQA-server JSON, and
     the official VQA metric over the 10 human answers
     (reference eval_vqa.py:96-167)

Expected dataset layout (the reference's download layout,
/root/reference/README.md:121-139):

  Questions/OpenEnded_mscoco_<set>_questions.json
  Annotations/mscoco_<set>_annotations.json
  Images/<set>/COCO_<set>_%012d.jpg
  parse/new_parse/<set>.ids.txt + <set>.questions.sp

tests/test_real_data_dryrun.py exercises the harness on a fabricated
miniature checkout and arms the real-data test via skipif, so the
parity run is a one-command event when data lands:

  python -m n2nmn_tpu.tools.vqa_dryrun --dataset_dir <vqa-dataset> \
      --resnet_weights resnet152.pth [--limit 256]
"""

from __future__ import annotations

import argparse
import json
import os

TRAIN_SET = "train2014"
VAL_SET = "val2014"


def _truncate_questions(question_file, annotation_file, out_q, out_ann,
                        limit):
    """First `limit` questions + their annotations; returns image ids."""
    with open(question_file) as f:
        qpay = json.load(f)
    qpay["questions"] = qpay["questions"][:limit]
    keep_qids = {q["question_id"] for q in qpay["questions"]}
    with open(annotation_file) as f:
        apay = json.load(f)
    apay["annotations"] = [a for a in apay["annotations"]
                           if a["question_id"] in keep_qids]
    os.makedirs(os.path.dirname(out_q), exist_ok=True)
    with open(out_q, "w") as f:
        json.dump(qpay, f)
    with open(out_ann, "w") as f:
        json.dump(apay, f)
    return sorted({q["image_id"] for q in qpay["questions"]})


def _extract_features(image_dir, image_set, image_ids, out_dir,
                      resnet_params, image_size=448, batch_size=8):
    """On-device res5c features, saved [1, H/32, W/32, 2048] per image —
    the layout exp_vqa/data/extract_resnet152_res5c.py writes."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from n2nmn_tpu.models.resnet import resnet152_res5c

    @jax.jit
    def extract(batch_rgb01):
        return resnet152_res5c(resnet_params, batch_rgb01)

    os.makedirs(out_dir, exist_ok=True)
    names = ["COCO_%s_%012d" % (image_set, i) for i in image_ids]
    for i in range(0, len(names), batch_size):
        chunk = names[i:i + batch_size]
        imgs = []
        for name in chunk:
            im = Image.open(os.path.join(
                image_dir, image_set, name + ".jpg")).convert(
                "RGB").resize((image_size, image_size))
            imgs.append(np.asarray(im, np.float32) / 255.0)
        feats = np.asarray(extract(jnp.asarray(np.stack(imgs))),
                           np.float32)
        for name, feat in zip(chunk, feats):
            np.save(os.path.join(out_dir, name + ".npy"), feat[None])


def run_dryrun(dataset_dir, work_dir="./exp_vqa_dryrun", limit=256,
               train_iters=100, resnet_weights=None, image_size=448,
               batch_size=8):
    from n2nmn_tpu.data.builders.vqa_imdb import build_imdb
    from n2nmn_tpu.data.builders.vqa_layouts import convert_split
    from n2nmn_tpu.experiments import vqa

    import numpy as np

    data_dir = os.path.join(work_dir, "data")
    os.makedirs(os.path.join(data_dir, "imdb"), exist_ok=True)

    # the standard vocab/answer files ship in-repo
    import shutil
    src_data = os.path.join(os.path.dirname(__file__), "..", "..",
                            "exp_vqa", "data")
    for fn in ("vocabulary_vqa.txt", "answers_vqa.txt",
               "vocabulary_layout.txt"):
        shutil.copy(os.path.join(src_data, fn),
                    os.path.join(data_dir, fn))

    # ResNet weights: converted if provided, else random-init
    import jax
    from n2nmn_tpu.models import resnet
    if resnet_weights and resnet_weights.endswith(".npz"):
        from n2nmn_tpu.train.checkpoint import load_params
        params_t = resnet.init_random(jax.random.PRNGKey(0))
        resnet_params, _ = load_params(resnet_weights, params_t)
        weights_kind = resnet_weights
    elif resnet_weights:
        import torch
        sd = torch.load(resnet_weights, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        resnet_params = resnet.from_torchvision_state_dict(sd)
        weights_kind = resnet_weights
    else:
        resnet_params = resnet.init_random(jax.random.PRNGKey(0))
        weights_kind = "RANDOM-INIT (plumbing dry run only)"
    print(f"ResNet-152 weights: {weights_kind}")

    stages = []
    for image_set, tag in ((TRAIN_SET, "dryrun_trn"),
                           (VAL_SET, "dryrun_val")):
        qf = os.path.join(dataset_dir, "Questions",
                          f"OpenEnded_mscoco_{image_set}_questions.json")
        af = os.path.join(dataset_dir, "Annotations",
                          f"mscoco_{image_set}_annotations.json")
        assert os.path.exists(qf), qf
        assert os.path.exists(af), af
        sub_qf = os.path.join(data_dir, f"questions_{image_set}.json")
        sub_af = os.path.join(data_dir, f"annotations_{image_set}.json")
        image_ids = _truncate_questions(qf, af, sub_qf, sub_af, limit)
        print(f"[{image_set}] {limit} questions / {len(image_ids)} images")

        # stage 1: parse -> layouts (whole split; dict lookup below)
        parse_dir = os.path.join(dataset_dir, "parse", "new_parse")
        layout_npy = os.path.join(data_dir,
                                  f"gt_layout_{image_set}.npy")
        convert_split(
            os.path.join(parse_dir, f"{image_set}.ids.txt"),
            os.path.join(parse_dir, f"{image_set}.questions.sp"),
            layout_npy,
            os.path.join(data_dir, "vocabulary_layout.txt"))

        # stage 2: on-device res5c features for the subset's images
        feat_dir = os.path.join(work_dir, "features", image_set)
        _extract_features(os.path.join(dataset_dir, "Images"), image_set,
                          image_ids, feat_dir, resnet_params,
                          image_size, batch_size)

        # stage 3: imdb
        imdb = build_imdb(
            image_set, sub_qf, sub_af, layout_npy,
            os.path.join(dataset_dir, "Images", image_set), feat_dir,
            os.path.join(data_dir, "answers_vqa.txt"))
        np.save(os.path.join(data_dir, "imdb", f"imdb_{tag}.npy"), imdb)
        stages.append((image_set, len(imdb)))

    # stage 4: cloning steps through the standard trainer (qpn on,
    # answer sampling — reference train_vqa_gt_layout.py:23-59)
    cfg = vqa.VqaConfig(
        exp_name="dryrun_gt_layout", root=work_dir, seed=0,
        max_iter=train_iters, snapshot_interval=train_iters,
        N=min(64, limit), imdb_trn="data/imdb/imdb_dryrun_trn.npy")
    vqa.train(cfg)

    # stage 5: greedy eval + server JSON + official VQA metric
    ecfg = vqa.VqaConfig(root=work_dir,
                         imdb_trn="data/imdb/imdb_dryrun_trn.npy")
    res = vqa.evaluate(ecfg, "dryrun_gt_layout", f"{train_iters:08d}",
                       "dryrun_val", batch_size=min(50, limit))
    print("dry run complete:", json.dumps(
        {"stages": stages, "eval": {k: v for k, v in res.items()
                                    if not isinstance(v, dict)}}))
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", default="./exp_vqa/vqa-dataset")
    p.add_argument("--work_dir", default="./exp_vqa_dryrun")
    p.add_argument("--limit", type=int, default=256)
    p.add_argument("--train_iters", type=int, default=100)
    p.add_argument("--resnet_weights", default=None)
    p.add_argument("--image_size", type=int, default=448)
    args = p.parse_args()
    run_dryrun(args.dataset_dir, args.work_dir, args.limit,
               args.train_iters, args.resnet_weights, args.image_size)
