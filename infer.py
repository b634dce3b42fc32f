#!/usr/bin/env python
"""Single-image inference demo (reference infer.py:152-163):
`python infer.py [image.jpg] [checkpoint]`."""

import sys
from time import time

from PIL import Image

from mde_tpu.infer import InferenceHelper

if __name__ == "__main__":
    image_path = sys.argv[1] if len(sys.argv) > 1 else "test_imgs/classroom__rgb_00283.jpg"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "./pretrained/AdaBins_nyu.pt"

    img = Image.open(image_path)
    start = time()
    helper = InferenceHelper(dataset="nyu", checkpoint_path=ckpt)
    centers, pred = helper.predict_pil(img)
    print(f"took :{time() - start}s")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.imshow(pred.squeeze(), cmap="magma_r")
    plt.savefig("./thingy.png")
