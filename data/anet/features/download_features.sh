#!/usr/bin/env bash
# ActivityNet feature downloads (URLs from the reference release notes).
# C3D:  http://activity-net.org/challenges/2016/download.html
#       -> sub_activitynet_v1-3.c3d.hdf5, then:
#       python tools/convert_h5_features.py --h5 sub_activitynet_v1-3.c3d.hdf5 \
#           --key c3d_features --out data/anet/features/c3d
# TSN / TSP / I3D+VGGish: see the PDVC release mirrors referenced in
# data/README.md; place per-video .npy files in the matching folder.
echo "See comments in this script and data/README.md for sources."
