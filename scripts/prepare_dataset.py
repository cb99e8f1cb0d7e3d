#!/usr/bin/env python
"""Build the manifest files the framework trains from out of the standard
dataset distributions — a script-ified port of the reference's per-dataset
Jupyter recipes (data/*/dataset_preparation.ipynb; the reference ships the
finished manifests, the notebooks document how they were made).

    python scripts/prepare_dataset.py cub200   <data_root>/data/cub200_2011
    python scripts/prepare_dataset.py cars196  <data_root>/data/cars196
    python scripts/prepare_dataset.py aircraft <data_root>/data/aircraft
    python scripts/prepare_dataset.py food101  <data_root>/data/food101
    python scripts/prepare_dataset.py nabirds  <data_root>/data/nabirds
    python scripts/prepare_dataset.py vegfru   <data_root>/data/vegfru
    python scripts/prepare_dataset.py inat_birds <data_root>/data/inat_birds \
        --prefix data/inat   # shipped manifests use the data/inat prefix

Writes <out>/{train,test,database}.txt (one "<path> <int-label>" per line,
paths relative to the data root, train == database) and class_names.txt.
Expected layouts:

  cub200:   <out>/CUB_200_2011/{images/, images.txt, image_class_labels.txt,
            train_test_split.txt, classes.txt}   (CUB-200-2011 tarball)
  cars196:  <out>/stanford_cars/{cars_train/, cars_test/,
            devkit/cars_train_annos.mat, devkit/cars_meta.mat,
            cars_test_annos_withlabels.mat}      (Stanford Cars)
  aircraft: <out>/fgvc-aircraft-2013b/data/{images/, variants.txt,
            images_variant_trainval.txt, images_variant_test.txt}
  food101:  <out>/food-101/{images/, meta/{classes.txt,train.json,test.json}}
  nabirds:  <out>/nabirds/{images/, classes.txt, images.txt,
            image_class_labels.txt, train_test_split.txt}
  vegfru:   <out>/{veg200_images/, fru92_images/,
            veg200_lists/veg_{train,val,test}.txt,
            fru92_lists/fru_{train,val,test}.txt}
  inat_birds: <out>/inat2021/{train,val}/
            <id>_Animalia_Chordata_Aves_<Order>_<Family>_<Genus>_<species>/
            *.jpg                            (iNat2021 layout, Aves dirs)
"""

from __future__ import annotations

import argparse
import os


def _write(path: str, lines) -> None:
    with open(path, "w") as f:
        for line in lines:
            f.write(line + "\n")
    print(f"{path}: {len(lines)} lines")


def prepare_cub200(out: str, prefix: str) -> None:
    """CUB_200_2011/dataset_preparation.ipynb: split_id 1 -> train+database,
    0 -> test; labels are class_id-1; class names from classes.txt with the
    '001.' prefix stripped and underscores spaced."""
    root = os.path.join(out, "CUB_200_2011")

    def pairs(fn):
        with open(os.path.join(root, fn)) as f:
            return [line.strip().split(" ", 1) for line in f if line.strip()]

    id2key = dict(pairs("images.txt"))
    id2class = dict(pairs("image_class_labels.txt"))
    id2split = {k: int(v) for k, v in pairs("train_test_split.txt")}

    train, test = [], []
    for fn_id, key in sorted(id2key.items(), key=lambda kv: kv[1]):
        label = int(id2class[fn_id]) - 1
        row = f"{prefix}/CUB_200_2011/images/{key} {label}"
        (train if id2split[fn_id] == 1 else test).append(row)
    _write(os.path.join(out, "train.txt"), train)
    _write(os.path.join(out, "database.txt"), train)
    _write(os.path.join(out, "test.txt"), test)

    names = [kv[1].split(".", 1)[1].replace("_", " ").lower()
             for kv in pairs("classes.txt")]
    _write(os.path.join(out, "class_names.txt"), names)


def prepare_cars196(out: str, prefix: str) -> None:
    """cars196/dataset_preparation.ipynb: labels from the devkit .mat
    annotations (class-1), names from cars_meta.mat."""
    import scipy.io as sio

    sc = os.path.join(out, "stanford_cars")
    train_mat = sio.loadmat(os.path.join(sc, "devkit", "cars_train_annos.mat"),
                            squeeze_me=True)
    test_mat = sio.loadmat(os.path.join(sc, "cars_test_annos_withlabels.mat"),
                           squeeze_me=True)

    def rows(mat, sub):
        import numpy as np

        anns = np.atleast_1d(mat["annotations"])  # squeeze_me 0-d for n=1
        return [f"{prefix}/stanford_cars/{sub}/{a['fname']} "
                f"{int(a['class']) - 1}" for a in anns]

    train = rows(train_mat, "cars_train")
    _write(os.path.join(out, "train.txt"), train)
    _write(os.path.join(out, "database.txt"), train)
    _write(os.path.join(out, "test.txt"), rows(test_mat, "cars_test"))

    meta = sio.loadmat(os.path.join(sc, "devkit", "cars_meta.mat"),
                       squeeze_me=True)
    _write(os.path.join(out, "class_names.txt"),
           [str(c) for c in meta["class_names"].tolist()])


def prepare_aircraft(out: str, prefix: str) -> None:
    """aircraft/dataset_preparation.ipynb: variants.txt order defines the
    label ids; trainval -> train+database, test -> test."""
    data = os.path.join(out, "fgvc-aircraft-2013b", "data")
    with open(os.path.join(data, "variants.txt")) as f:
        variants = [line.strip() for line in f if line.strip()]
    c2i = {c: i for i, c in enumerate(variants)}

    def rows(fn):
        res = []
        with open(os.path.join(data, fn)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                img_id, variant = line.split(" ", 1)
                res.append(f"{prefix}/fgvc-aircraft-2013b/data/images/"
                           f"{img_id}.jpg {c2i[variant]}")
        return res

    train = rows("images_variant_trainval.txt")
    _write(os.path.join(out, "train.txt"), train)
    _write(os.path.join(out, "database.txt"), train)
    _write(os.path.join(out, "test.txt"), rows("images_variant_test.txt"))
    _write(os.path.join(out, "class_names.txt"),
           [v.lower() for v in variants])


def prepare_food101(out: str, prefix: str) -> None:
    """food101/dataset_preparation.ipynb: meta/{train,test}.json class->files
    maps define the splits; label = line index in meta/classes.txt; class
    names lower-cased with underscores spaced; train == database."""
    import json

    meta = os.path.join(out, "food-101", "meta")
    with open(os.path.join(meta, "classes.txt")) as f:
        classes = [line.strip() for line in f if line.strip()]
    c2i = {c: i for i, c in enumerate(classes)}

    def rows(fn):
        with open(os.path.join(meta, fn)) as f:
            split = json.load(f)
        res = []
        for cls_name, files in split.items():  # json file order, as the
            for filename in files:             # notebook iterates
                res.append(f"{prefix}/food-101/images/{filename}.jpg "
                           f"{c2i[cls_name]}")
        return res

    train = rows("train.json")
    _write(os.path.join(out, "train.txt"), train)
    _write(os.path.join(out, "database.txt"), train)
    _write(os.path.join(out, "test.txt"), rows("test.json"))
    _write(os.path.join(out, "class_names.txt"),
           [" ".join(c.lower().split("_")) for c in classes])


def prepare_nabirds(out: str, prefix: str) -> None:
    """nabirds/data_preparation.ipynb: the 555 class ids that actually appear
    in image_class_labels.txt are re-indexed densely in order of first
    appearance; split from train_test_split.txt; names from classes.txt in
    that appearance order."""
    root = os.path.join(out, "nabirds")

    def pairs(fn):
        with open(os.path.join(root, fn)) as f:
            return [line.strip().split(" ", 1) for line in f if line.strip()]

    classid2name = dict(pairs("classes.txt"))
    uuid2path = {u: f"{prefix}/nabirds/images/{fn}"
                 for u, fn in pairs("images.txt")}
    uuid2classid = {}
    classid2index: dict = {}
    for uuid, classid in pairs("image_class_labels.txt"):
        uuid2classid[uuid] = classid
        if classid not in classid2index:  # dense ids by first appearance
            classid2index[classid] = len(classid2index)
    uuid2istrain = {u: v.strip() == "1"
                    for u, v in pairs("train_test_split.txt")}

    train, test = [], []
    for uuid, path in uuid2path.items():  # images.txt order
        row = f"{path} {classid2index[uuid2classid[uuid]]}"
        (train if uuid2istrain[uuid] else test).append(row)
    _write(os.path.join(out, "train.txt"), train)
    _write(os.path.join(out, "database.txt"), train)
    _write(os.path.join(out, "test.txt"), test)
    _write(os.path.join(out, "class_names.txt"),
           [classid2name[cid] for cid in classid2index])


def prepare_vegfru(out: str, prefix: str) -> None:
    """vegfru/dataset_preparation.ipynb: veg200 labels keep 0-199, fru92
    labels shift by +200 (292 classes total); train+val -> train+database,
    test -> test; class names from the image directory names."""
    def read_list(sub, stem, split, offset):
        rows = []
        with open(os.path.join(out, f"{sub}_lists",
                               f"{stem}_{split}.txt")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                path, label = line.rsplit(" ", 1)
                rows.append((f"{prefix}/{sub}_images/{path}",
                             int(label) + offset))
        return rows

    train = (read_list("veg200", "veg", "train", 0)
             + read_list("veg200", "veg", "val", 0)
             + read_list("fru92", "fru", "train", 200)
             + read_list("fru92", "fru", "val", 200))
    test = (read_list("veg200", "veg", "test", 0)
            + read_list("fru92", "fru", "test", 200))

    lines = [f"{p} {l}" for p, l in train]
    _write(os.path.join(out, "train.txt"), lines)
    _write(os.path.join(out, "database.txt"), lines)
    _write(os.path.join(out, "test.txt"), [f"{p} {l}" for p, l in test])

    names = {}
    for p, l in train:
        names[l] = " ".join(p.split("/")[-2].split("_")).lower()
    # notebook writes range(292); ascending label order generalizes that
    # (sorted(names) == range(292) on the full distribution)
    _write(os.path.join(out, "class_names.txt"),
           [names[i] for i in sorted(names)])


def prepare_inat_birds(out: str, prefix: str) -> None:
    """iNat2021 birds subset (reference data/inat_birds/ ships test.txt +
    class_names.txt; train/database are missing-large-blobs there, per its
    .MISSING_LARGE_BLOBS note). Recipe reverse-derived from the shipped
    artifacts: keep the Aves class directories of the iNat2021 competition
    layout; label = rank of the class DIRECTORY name sorted ascending
    (equivalently the iNat category-id order — the id prefix sorts with the
    taxonomy string); class name = the binomial (last two directory tokens,
    lowercased, space-joined) in that same order. Verified against the
    shipped files across ALL 14,860 test.txt rows: dir-sorted rank == label
    and class_names.txt line == binomial (tests/test_prepare_dataset.py).
    train/ -> train.txt + database.txt, val/ -> test.txt (14,860 = 1486x10
    in the shipped manifest — the full val split).

    Layout: <out>/inat2021/{train,val}/<id>_Animalia_Chordata_Aves_<...>_
    <Genus>_<species>/*.jpg. The shipped manifests use path prefix
    'data/inat' (configs/dataset root joins it), so run with
    --prefix data/inat for reference-identical lines; file ordering within
    a split is ours (sorted) — the shipped test.txt order is shuffled and
    not reproducible from the data alone.
    """
    root = os.path.join(out, "inat2021")

    def bird_dirs(split):
        d = os.path.join(root, split)
        if not os.path.isdir(d):
            return []
        return sorted(e for e in os.listdir(d) if "_Aves_" in e)

    def binomial(dirname: str) -> str:
        toks = dirname.split("_")
        return f"{toks[-2]} {toks[-1]}".lower()

    dirs = sorted({d for split in ("train", "val") for d in bird_dirs(split)})
    index = {d: i for i, d in enumerate(dirs)}
    names = [binomial(d) for d in dirs]

    def manifest(split):
        res = []
        for cls_dir in bird_dirs(split):
            label = index[cls_dir]
            d = os.path.join(root, split, cls_dir)
            for fn in sorted(os.listdir(d)):
                res.append(f"{prefix}/inat2021/{split}/{cls_dir}/{fn} {label}")
        return res

    train = manifest("train")
    _write(os.path.join(out, "train.txt"), train)
    _write(os.path.join(out, "database.txt"), train)
    _write(os.path.join(out, "test.txt"), manifest("val"))
    _write(os.path.join(out, "class_names.txt"), names)


PREPARERS = {"cub200": prepare_cub200, "cars196": prepare_cars196,
             "aircraft": prepare_aircraft, "food101": prepare_food101,
             "nabirds": prepare_nabirds, "vegfru": prepare_vegfru,
             "inat_birds": prepare_inat_birds}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(PREPARERS))
    ap.add_argument("out", help="dataset folder (e.g. data/cub200_2011)")
    ap.add_argument("--prefix", default=None,
                    help="path prefix written into manifests (default: "
                    "data/<folder-name>, matching the reference layout)")
    args = ap.parse_args()
    prefix = args.prefix or f"data/{os.path.basename(os.path.normpath(args.out))}"
    PREPARERS[args.dataset](args.out, prefix)


if __name__ == "__main__":
    main()
