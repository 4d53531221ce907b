"""iNaturalist dataset from the standard annotation JSONs.

Behavioral parity with /root/reference/deit/datasets.py:13-52 (INatDataset):
  * reads {train|val}{year}.json for the image list and categories.json for
    the taxonomy; class ids are assigned by FIRST APPEARANCE ORDER of the
    chosen taxonomic `category` level in the train annotations (the
    reference's `targeter` indexing), so labels match exactly;
  * image paths reconstructed as root/<part0>/<category_id>/<filename>.

Exposes the same (samples, class count) contract as ImageFolder, so
mrla_tpu.data.imagefolder.iterate_batches works unchanged (including the
native JPEG fast path).
"""

from __future__ import annotations

import json
import os


class INatDataset:
    def __init__(self, root: str, train: bool = True, year: int = 2018,
                 category: str = "name"):
        split = "train" if train else "val"
        with open(os.path.join(root, f"{split}{year}.json")) as f:
            data = json.load(f)
        with open(os.path.join(root, "categories.json")) as f:
            categories = json.load(f)
        with open(os.path.join(root, f"train{year}.json")) as f:
            train_data = json.load(f)

        # class ids by first-appearance order in the TRAIN annotations
        targeter: dict = {}
        for ann in train_data["annotations"]:
            key = categories[int(ann["category_id"])][category]
            if key not in targeter:
                targeter[key] = len(targeter)
        self.num_classes = len(targeter)

        self.samples: list[tuple[str, int]] = []
        for img in data["images"]:
            parts = img["file_name"].split("/")
            category_id = int(parts[2])
            path = os.path.join(root, parts[0], parts[2], parts[3])
            label = targeter[categories[category_id][category]]
            self.samples.append((path, label))
        if not self.samples:
            raise FileNotFoundError(f"no images listed in {split}{year}.json")

    def __len__(self) -> int:
        return len(self.samples)
