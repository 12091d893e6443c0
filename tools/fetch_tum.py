#!/usr/bin/env python
"""Fetch a TUM RGB-D sequence and convert it to .klg for the engine.

BASELINE.md's accuracy metric is ATE on TUM fr1/desk (+ ICL-NUIM
lr kt2). This script downloads a sequence, unpacks it, and runs
tools/tum_to_klg.py so the engine can replay it with `-l`.

STATUS IN THIS ENVIRONMENT: the download FAILS — the sandbox has no
egress (DNS resolution itself fails):

    $ python tools/fetch_tum.py fr1/desk
    urllib.error.URLError: <urlopen error [Errno -2] Name or service not known>

The bench therefore reports the synthetic fr1/desk PROXY instead
(bench.py phase D: desk scene + handheld sweep through the Kinect-v1
SensorModel in kintinuous_tpu/io/synth.py). Run this script from a
connected machine to evaluate on the real data.
"""

import argparse
import os
import subprocess
import sys
import tarfile
import urllib.request

SEQUENCES = {
    "fr1/desk": (
        "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
        "rgbd_dataset_freiburg1_desk.tgz"
    ),
    "fr1/room": (
        "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
        "rgbd_dataset_freiburg1_room.tgz"
    ),
    "fr2/desk": (
        "https://cvg.cit.tum.de/rgbd/dataset/freiburg2/"
        "rgbd_dataset_freiburg2_desk.tgz"
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sequence", choices=sorted(SEQUENCES), nargs="?",
                    default="fr1/desk")
    ap.add_argument("--out", default="datasets")
    args = ap.parse_args()

    url = SEQUENCES[args.sequence]
    os.makedirs(args.out, exist_ok=True)
    tgz = os.path.join(args.out, os.path.basename(url))
    print(f"fetching {url} -> {tgz}")
    urllib.request.urlretrieve(url, tgz)  # raises URLError without egress

    with tarfile.open(tgz) as tf:
        tf.extractall(args.out)
    seq_dir = os.path.join(
        args.out, os.path.basename(url).removesuffix(".tgz")
    )
    klg = seq_dir + ".klg"
    print(f"converting {seq_dir} -> {klg}")
    subprocess.check_call(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "tum_to_klg.py"), seq_dir, klg]
    )
    print(f"done. run: python -m kintinuous_tpu.cli -l {klg} -ri "
          f"-p {seq_dir}/groundtruth.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
