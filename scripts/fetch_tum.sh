#!/usr/bin/env bash
# Fetch a TUM RGB-D benchmark sequence for `vslam-run reproduce` (run on a
# machine with network access; this build environment has zero egress).
#
# The reference's published numbers are on rgbd_dataset_freiburg2_desk
# (/root/reference/README.md:10-12); its CI mounts the same sequence
# (.gitlab-ci.yml:25-28). Usage:
#
#   scripts/fetch_tum.sh [sequence] [dest_dir]
#   scripts/fetch_tum.sh rgbd_dataset_freiburg2_desk /data
#   vslam-run reproduce --dataset /data/rgbd_dataset_freiburg2_desk
#
# The dataset ships rgb/, depth/ (16-bit PNG, 1/5000 m), rgb.txt, depth.txt,
# groundtruth.txt — exactly the layout vslam_tpu.io.tum.TumDataset reads
# (closest-timestamp pairing at the reference's 0.2 s threshold, its Queue
# semantics).
set -euo pipefail

SEQ="${1:-rgbd_dataset_freiburg2_desk}"
DEST="${2:-.}"
# freiburg1|freiburg2|freiburg3 subdirectory from the sequence name
GROUP=$(echo "$SEQ" | sed -E 's/^rgbd_dataset_(freiburg[0-9]).*/\1/')
URL="https://cvg.cit.tum.de/rgbd/dataset/${GROUP}/${SEQ}.tgz"

mkdir -p "$DEST"
echo "fetching $URL -> $DEST/$SEQ"
curl -L --fail -o "$DEST/$SEQ.tgz" "$URL"
tar -xzf "$DEST/$SEQ.tgz" -C "$DEST"
rm "$DEST/$SEQ.tgz"
echo "done: $DEST/$SEQ"
echo "next: vslam-run reproduce --dataset $DEST/$SEQ"
