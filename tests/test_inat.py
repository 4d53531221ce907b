"""INatDataset: label assignment parity with the reference targeter logic."""

import json
import os

from mrla_tpu.data.inat import INatDataset


def _write_fixture(root):
    cats = [
        {"name": "sp_a", "family": "fam1"},
        {"name": "sp_b", "family": "fam1"},
        {"name": "sp_c", "family": "fam2"},
    ]
    # annotations visit categories in order 2, 0, 1 -> first-appearance ids
    train = {
        "images": [
            {"file_name": "train_val2018/x/2/img0.jpg"},
            {"file_name": "train_val2018/x/0/img1.jpg"},
            {"file_name": "train_val2018/x/1/img2.jpg"},
        ],
        "annotations": [
            {"category_id": 2}, {"category_id": 0}, {"category_id": 1},
        ],
    }
    val = {"images": [{"file_name": "train_val2018/x/0/v0.jpg"}],
           "annotations": [{"category_id": 0}]}
    os.makedirs(root, exist_ok=True)
    json.dump(train, open(os.path.join(root, "train2018.json"), "w"))
    json.dump(val, open(os.path.join(root, "val2018.json"), "w"))
    json.dump(cats, open(os.path.join(root, "categories.json"), "w"))


def test_inat_label_order(tmp_path):
    root = str(tmp_path)
    _write_fixture(root)
    ds = INatDataset(root, train=True, year=2018, category="name")
    assert ds.num_classes == 3
    # sp_c first in annotations -> id 0; sp_a -> 1; sp_b -> 2
    labels = [lbl for _, lbl in ds.samples]
    assert labels == [0, 1, 2]
    val = INatDataset(root, train=False, year=2018)
    assert val.samples[0][1] == 1  # category 0 = sp_a -> id 1


def test_inat_family_level(tmp_path):
    root = str(tmp_path)
    _write_fixture(root)
    ds = INatDataset(root, train=True, category="family")
    assert ds.num_classes == 2  # fam2 (id 0), fam1 (id 1)
    assert [l for _, l in ds.samples] == [0, 1, 1]
