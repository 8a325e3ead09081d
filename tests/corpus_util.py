"""Shared miniature CUB-shaped corpus builder for data/eval tests."""

import os
import pickle

import numpy as np
from PIL import Image

from eegan_tpu.data.prep import build_captions_pickle

N_FILES = 6
CAPS_PER_IMAGE = 2


def build_corpus(root) -> str:
    root = str(root)
    rng = np.random.RandomState(0)

    filenames, bboxes = [], {}
    os.makedirs(os.path.join(root, "images", "001.cls"), exist_ok=True)
    os.makedirs(os.path.join(root, "text", "001.cls"), exist_ok=True)
    for i in range(N_FILES):
        key = f"001.cls/img_{i}"
        filenames.append(key)
        arr = rng.randint(0, 255, (300, 400, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "images", f"{key}.jpg"))
        with open(os.path.join(root, "text", f"{key}.txt"), "w") as f:
            f.write(f"this bird has a bright red head number {i}\n"
                    f"a small bird with white belly and black wings\n")
        bboxes[key] = [50, 40, 200, 180]

    for split, names in [("train", filenames[:4]), ("test", filenames[4:])]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        with open(os.path.join(root, split, "filenames.pickle"), "wb") as f:
            pickle.dump(names, f, protocol=2)
        with open(os.path.join(root, split, "class_info.pickle"), "wb") as f:
            pickle.dump([1 + (i % 2) for i in range(len(names))], f, protocol=2)

    with open(os.path.join(root, "bounding_boxes.pickle"), "wb") as f:
        pickle.dump(bboxes, f, protocol=2)

    build_captions_pickle(root, CAPS_PER_IMAGE)

    with open(os.path.join(root, "captions.pickle"), "rb") as f:
        train_ids, test_ids, ixtoword, wordtoix = pickle.load(f)
    mk = lambda caps: [[c[:3], c[3:5]] if len(c) >= 5 else [c] for c in caps]
    os.makedirs(os.path.join(root, "attributes"), exist_ok=True)
    with open(os.path.join(root, "attributes", "EE-GAN.pickle"), "wb") as f:
        pickle.dump([mk(train_ids), mk(test_ids)], f, protocol=2)

    return root
