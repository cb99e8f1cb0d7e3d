"""scripts/prepare_dataset.py: manifest builders reproduce the reference's
notebook recipes (data/*/dataset_preparation.ipynb) — line format matches the
shipped manifests, splits honored, labels 0-based, train == database."""

import importlib.util
import os

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "prepare_dataset", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "prepare_dataset.py"))
prep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(prep)


def _read(path):
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def test_cub200_manifests(tmp_path):
    root = tmp_path / "cub200_2011" / "CUB_200_2011"
    root.mkdir(parents=True)
    (root / "images.txt").write_text(
        "1 001.Black_footed_Albatross/a.jpg\n"
        "2 001.Black_footed_Albatross/b.jpg\n"
        "3 002.Laysan_Albatross/c.jpg\n")
    (root / "image_class_labels.txt").write_text("1 1\n2 1\n3 2\n")
    (root / "train_test_split.txt").write_text("1 1\n2 0\n3 1\n")
    (root / "classes.txt").write_text(
        "1 001.Black_footed_Albatross\n2 002.Laysan_Albatross\n")

    out = str(tmp_path / "cub200_2011")
    prep.prepare_cub200(out, "data/cub200_2011")

    train = _read(os.path.join(out, "train.txt"))
    assert train == [
        "data/cub200_2011/CUB_200_2011/images/"
        "001.Black_footed_Albatross/a.jpg 0",
        "data/cub200_2011/CUB_200_2011/images/002.Laysan_Albatross/c.jpg 1"]
    assert _read(os.path.join(out, "database.txt")) == train
    assert _read(os.path.join(out, "test.txt")) == [
        "data/cub200_2011/CUB_200_2011/images/"
        "001.Black_footed_Albatross/b.jpg 0"]
    assert _read(os.path.join(out, "class_names.txt")) == [
        "black footed albatross", "laysan albatross"]


def test_cars196_manifests(tmp_path):
    sio = pytest.importorskip("scipy.io")
    sc = tmp_path / "cars196" / "stanford_cars"
    (sc / "devkit").mkdir(parents=True)
    ann = np.array([("00001.jpg", 14), ("00002.jpg", 3)],
                   dtype=[("fname", "O"), ("class", "O")])
    sio.savemat(str(sc / "devkit" / "cars_train_annos.mat"),
                {"annotations": ann})
    ann_t = np.array([("10001.jpg", 1)],
                     dtype=[("fname", "O"), ("class", "O")])
    sio.savemat(str(sc / "cars_test_annos_withlabels.mat"),
                {"annotations": ann_t})
    sio.savemat(str(sc / "devkit" / "cars_meta.mat"),
                {"class_names": np.array(["AM Hornet", "Acura RL"], "O")})

    out = str(tmp_path / "cars196")
    prep.prepare_cars196(out, "data/cars196")
    assert _read(os.path.join(out, "train.txt")) == [
        "data/cars196/stanford_cars/cars_train/00001.jpg 13",
        "data/cars196/stanford_cars/cars_train/00002.jpg 2"]
    assert _read(os.path.join(out, "test.txt")) == [
        "data/cars196/stanford_cars/cars_test/10001.jpg 0"]
    assert _read(os.path.join(out, "class_names.txt")) == [
        "AM Hornet", "Acura RL"]


def test_aircraft_manifests(tmp_path):
    data = tmp_path / "aircraft" / "fgvc-aircraft-2013b" / "data"
    data.mkdir(parents=True)
    (data / "variants.txt").write_text("707-320\nA300B4\n")
    (data / "images_variant_trainval.txt").write_text(
        "1025794 707-320\n1340192 A300B4\n")
    (data / "images_variant_test.txt").write_text("200001 A300B4\n")

    out = str(tmp_path / "aircraft")
    prep.prepare_aircraft(out, "data/aircraft")
    train = _read(os.path.join(out, "train.txt"))
    assert train == [
        "data/aircraft/fgvc-aircraft-2013b/data/images/1025794.jpg 0",
        "data/aircraft/fgvc-aircraft-2013b/data/images/1340192.jpg 1"]
    assert _read(os.path.join(out, "database.txt")) == train
    assert _read(os.path.join(out, "test.txt")) == [
        "data/aircraft/fgvc-aircraft-2013b/data/images/200001.jpg 1"]
    assert _read(os.path.join(out, "class_names.txt")) == ["707-320",
                                                           "a300b4"]


def test_manifests_parse_via_framework(tmp_path):
    """The produced files load through data.manifest.read_manifest."""
    from concepthash_tpu.data.manifest import read_manifest

    root = tmp_path / "cub200_2011" / "CUB_200_2011"
    root.mkdir(parents=True)
    (root / "images.txt").write_text("1 001.A/a.jpg\n2 002.B/b.jpg\n")
    (root / "image_class_labels.txt").write_text("1 1\n2 2\n")
    (root / "train_test_split.txt").write_text("1 1\n2 1\n")
    (root / "classes.txt").write_text("1 001.A\n2 002.B\n")
    out = str(tmp_path / "cub200_2011")
    prep.prepare_cub200(out, "data/cub200_2011")
    m = read_manifest(out, "train.txt")
    assert len(m.paths) == 2
    np.testing.assert_array_equal(m.labels, [0, 1])


def test_food101_manifests(tmp_path):
    import json

    meta = tmp_path / "food101" / "food-101" / "meta"
    meta.mkdir(parents=True)
    (meta / "classes.txt").write_text("apple_pie\nbaby_back_ribs\n")
    (meta / "train.json").write_text(json.dumps(
        {"apple_pie": ["apple_pie/1001", "apple_pie/1002"],
         "baby_back_ribs": ["baby_back_ribs/2001"]}))
    (meta / "test.json").write_text(json.dumps(
        {"baby_back_ribs": ["baby_back_ribs/2002"]}))

    out = str(tmp_path / "food101")
    prep.prepare_food101(out, "data/food101")
    train = _read(os.path.join(out, "train.txt"))
    assert train == [
        "data/food101/food-101/images/apple_pie/1001.jpg 0",
        "data/food101/food-101/images/apple_pie/1002.jpg 0",
        "data/food101/food-101/images/baby_back_ribs/2001.jpg 1"]
    assert _read(os.path.join(out, "database.txt")) == train
    assert _read(os.path.join(out, "test.txt")) == [
        "data/food101/food-101/images/baby_back_ribs/2002.jpg 1"]
    assert _read(os.path.join(out, "class_names.txt")) == [
        "apple pie", "baby back ribs"]


def test_nabirds_manifests(tmp_path):
    root = tmp_path / "nabirds" / "nabirds"
    root.mkdir(parents=True)
    (root / "classes.txt").write_text(
        "295 Acadian Flycatcher\n296 Alder Flycatcher\n297 Unused Parent\n")
    (root / "images.txt").write_text(
        "u1 0295/a.jpg\nu2 0296/b.jpg\nu3 0295/c.jpg\n")
    # class 296 appears FIRST -> dense index 0 (appearance order)
    (root / "image_class_labels.txt").write_text(
        "u2 296\nu1 295\nu3 295\n")
    (root / "train_test_split.txt").write_text("u1 1\nu2 1\nu3 0\n")

    out = str(tmp_path / "nabirds")
    prep.prepare_nabirds(out, "data/nabirds")
    train = _read(os.path.join(out, "train.txt"))
    # images.txt order; labels densely re-indexed by appearance order
    assert train == ["data/nabirds/nabirds/images/0295/a.jpg 1",
                     "data/nabirds/nabirds/images/0296/b.jpg 0"]
    assert _read(os.path.join(out, "database.txt")) == train
    assert _read(os.path.join(out, "test.txt")) == [
        "data/nabirds/nabirds/images/0295/c.jpg 1"]
    assert _read(os.path.join(out, "class_names.txt")) == [
        "Alder Flycatcher", "Acadian Flycatcher"]


def test_inat_birds_manifests(tmp_path):
    """Labels are the alphabetical rank of the binomial name (verified
    against the reference's shipped test.txt/class_names.txt pairing);
    non-Aves directories are skipped; train == database; val -> test."""
    out = tmp_path / "inat_birds"
    tr = out / "inat2021" / "train"
    va = out / "inat2021" / "val"
    d1 = "03938_Animalia_Chordata_Aves_Passeriformes_Meliphagidae_Ptilotula_penicillata"
    d2 = "00001_Animalia_Chordata_Aves_Accipitriformes_Accipitridae_Accipiter_badius"
    d3 = "09999_Animalia_Chordata_Mammalia_Carnivora_Felidae_Felis_catus"  # not a bird
    for split_dir, imgs in ((tr / d1, ["x1.jpg"]), (tr / d2, ["y2.jpg", "y1.jpg"]),
                            (tr / d3, ["z.jpg"]), (va / d1, ["v1.jpg"])):
        split_dir.mkdir(parents=True)
        for fn in imgs:
            (split_dir / fn).touch()

    prep.prepare_inat_birds(str(out), "data/inat")
    train = _read(os.path.join(str(out), "train.txt"))
    # dirs sorted by id-prefix; files sorted; accipiter badius < ptilotula
    assert train == [
        f"data/inat/inat2021/train/{d2}/y1.jpg 0",
        f"data/inat/inat2021/train/{d2}/y2.jpg 0",
        f"data/inat/inat2021/train/{d1}/x1.jpg 1"]
    assert _read(os.path.join(str(out), "database.txt")) == train
    assert _read(os.path.join(str(out), "test.txt")) == [
        f"data/inat/inat2021/val/{d1}/v1.jpg 1"]
    assert _read(os.path.join(str(out), "class_names.txt")) == [
        "accipiter badius", "ptilotula penicillata"]


def test_inat_recipe_matches_shipped_reference():
    """The label rule reproduces the reference's shipped artifacts on every
    one of its 14,860 test.txt rows: label == rank of the class directory
    name sorted ascending, and class_names.txt line == its binomial."""
    ref = "/root/reference/data/inat_birds"
    if not os.path.exists(os.path.join(ref, "test.txt")):
        pytest.skip("reference inat assets unavailable")
    with open(os.path.join(ref, "class_names.txt")) as f:
        names = [l.strip() for l in f if l.strip()]
    assert len(names) == 1486
    d2l = {}
    with open(os.path.join(ref, "test.txt")) as f:
        for line in f:
            path, label = line.rsplit(" ", 1)
            d2l[path.split("/")[-2]] = int(label)
    assert len(d2l) == 1486
    for rank, d in enumerate(sorted(d2l)):
        assert d2l[d] == rank
        toks = d.split("_")
        assert names[rank] == f"{toks[-2]} {toks[-1]}".lower()


def test_vegfru_manifests(tmp_path):
    out = tmp_path / "vegfru"
    (out / "veg200_lists").mkdir(parents=True)
    (out / "fru92_lists").mkdir(parents=True)
    (out / "veg200_lists" / "veg_train.txt").write_text(
        "Chinese_artichoke/v1.jpg 0\n")
    (out / "veg200_lists" / "veg_val.txt").write_text(
        "water_spinach/v2.jpg 199\n")
    (out / "veg200_lists" / "veg_test.txt").write_text(
        "Chinese_artichoke/v3.jpg 0\n")
    (out / "fru92_lists" / "fru_train.txt").write_text("apple/f1.jpg 0\n")
    (out / "fru92_lists" / "fru_val.txt").write_text("yumberry/f2.jpg 91\n")
    (out / "fru92_lists" / "fru_test.txt").write_text("apple/f3.jpg 0\n")

    prep.prepare_vegfru(str(out), "data/vegfru")
    train = _read(os.path.join(str(out), "train.txt"))
    assert train == [
        "data/vegfru/veg200_images/Chinese_artichoke/v1.jpg 0",
        "data/vegfru/veg200_images/water_spinach/v2.jpg 199",
        "data/vegfru/fru92_images/apple/f1.jpg 200",   # fru labels +200
        "data/vegfru/fru92_images/yumberry/f2.jpg 291"]
    assert _read(os.path.join(str(out), "database.txt")) == train
    assert _read(os.path.join(str(out), "test.txt")) == [
        "data/vegfru/veg200_images/Chinese_artichoke/v3.jpg 0",
        "data/vegfru/fru92_images/apple/f3.jpg 200"]
    # class names in ascending label order (== range(292) on the full set)
    assert _read(os.path.join(str(out), "class_names.txt")) == [
        "chinese artichoke", "water spinach", "apple", "yumberry"]
