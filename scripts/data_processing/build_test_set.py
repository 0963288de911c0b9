"""
Assemble a self-contained evaluation/test-set tree from a split file plus
source directories — stems from the split are resolved in each source and
copied (or symlinked) into a flat per-kind layout:

    out/
      rgb/<stem>.png     gt/<stem>.png     pred/<stem>.npz   ...

This is the single-tool counterpart of the reference's test-set curation
scripts (scripts/data_processing/copy_test_set_from_splits.py,
copy_depth_maps_to_test_set.py, copy_npu_outputs_to_fin_test_set.py,
copy_calibration_images.py, create_and_populate_fin_test_set.py): one pass,
any number of --source kind=dir pairs, missing files reported per kind.

Split format: JSON list of stems / of {new_filename} / of {image_path}
entries (the NCDB split shapes, datasets/ncdb.py), or a .txt with one stem
per line (KITTI-style; first token, extension stripped).

Usage:
    python scripts/data_processing/build_test_set.py --split split.json \
        --source rgb=/data/images --source gt=/data/depth_maps \
        --output fin_test_set [--link] [--limit N]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

EXTS = ('.png', '.jpg', '.jpeg', '.npz', '.npy', '.bin', '.pcd')


def load_stems(split_path):
    if split_path.endswith('.json'):
        with open(split_path) as f:
            entries = json.load(f)
        stems = []
        for e in entries:
            if isinstance(e, dict):
                e = e.get('new_filename') or e.get('image_path') or ''
            stems.append(os.path.splitext(os.path.basename(str(e)))[0])
        return [s for s in stems if s]
    with open(split_path) as f:
        return [os.path.splitext(os.path.basename(ln.split()[0]))[0]
                for ln in f if ln.strip()]


def index_dir(root):
    """{stem: path} over a source tree (first match wins, sorted walk)."""
    idx = {}
    for dirpath, dirnames, files in os.walk(root):
        dirnames.sort()
        for f in sorted(files):
            if f.lower().endswith(EXTS):
                idx.setdefault(os.path.splitext(f)[0],
                               os.path.join(dirpath, f))
    return idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--split', required=True)
    ap.add_argument('--source', action='append', required=True,
                    metavar='KIND=DIR', help='e.g. rgb=/data/images')
    ap.add_argument('--output', required=True)
    ap.add_argument('--link', action='store_true',
                    help='symlink instead of copy')
    ap.add_argument('--limit', type=int, default=0)
    a = ap.parse_args()

    stems = load_stems(a.split)
    if a.limit:
        stems = stems[:a.limit]
    sources = dict(s.split('=', 1) for s in a.source)

    summary = {}
    for kind, src_dir in sources.items():
        idx = index_dir(src_dir)
        out_dir = os.path.join(a.output, kind)
        os.makedirs(out_dir, exist_ok=True)
        copied, missing = 0, []
        for stem in stems:
            src = idx.get(stem)
            if src is None:
                missing.append(stem)
                continue
            dst = os.path.join(out_dir,
                               stem + os.path.splitext(src)[1].lower())
            if os.path.lexists(dst):
                os.remove(dst)
            if a.link:
                os.symlink(os.path.abspath(src), dst)
            else:
                shutil.copy2(src, dst)
            copied += 1
        summary[kind] = (copied, missing)
        print('{}: {}/{} {} ({} missing)'.format(
            kind, copied, len(stems), 'linked' if a.link else 'copied',
            len(missing)))
        for stem in missing[:5]:
            print('  missing: {}'.format(stem))
    with open(os.path.join(a.output, 'manifest.json'), 'w') as f:
        json.dump({'split': os.path.abspath(a.split),
                   'stems': stems,
                   'kinds': {k: {'copied': c, 'missing': m}
                             for k, (c, m) in summary.items()}}, f, indent=2)
    print('manifest -> {}'.format(os.path.join(a.output, 'manifest.json')))


if __name__ == '__main__':
    main()
