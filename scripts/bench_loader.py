"""
Host input-pipeline benchmark (VERDICT round-1 item 6): synthetic full-size
KITTI tree -> decode rates (PIL vs native C++) and end-to-end DataLoader
epoch rates cold vs cached ('ram'/'disk' decoded-sample cache).

The device side consumes ~2500 img/s at 192x640 bs8 (BENCH_NOTES.md); the
steady-state host rate must match that, which on a 1-core loader host is
only reachable from the decoded cache — exactly the reference's strategy of
caching everything it can in /tmp (kitti_dataset_optimized.py:59-113).

Usage: python scripts/bench_loader.py [--images 48] [--root DIR]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

H, W = 375, 1242  # real KITTI_raw image size


def build_tree(root, n):
    from PIL import Image
    drive = os.path.join(root, '2011_09_26', '2011_09_26_drive_0001_sync')
    date_dir = os.path.join(root, '2011_09_26')
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = '{:010d}.png'.format(i)
        img_dir = os.path.join(drive, 'image_02', 'data')
        os.makedirs(img_dir, exist_ok=True)
        # realistic-entropy image: smooth gradients + noise compresses like
        # a road scene (pure noise would overstate decode cost)
        yy, xx = np.mgrid[0:H, 0:W]
        base = (xx * 0.15 + yy * 0.3 + i * 5) % 256
        img = (base[..., None] + rng.randn(H, W, 3) * 12).clip(0, 255)
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(img_dir, name))
        d_dir = os.path.join(drive, 'proj_depth', 'groundtruth', 'image_02')
        os.makedirs(d_dir, exist_ok=True)
        depth = (rng.rand(H, W) * 20 * 256 * (rng.rand(H, W) < 0.1)
                 ).astype(np.uint16)
        Image.fromarray(depth).save(os.path.join(d_dir, name))
        ox = os.path.join(drive, 'oxts', 'data')
        os.makedirs(ox, exist_ok=True)
        vals = [49.0 + i * 1e-6, 8.43, 112.0, 0.01, 0.02, 0.5] + [0.0] * 24
        np.savetxt(os.path.join(ox, name.replace('.png', '.txt')),
                   np.asarray(vals)[None])
        names.append(name)
    P = np.array([721.5, 0, W / 2, 0, 0, 721.5, H / 2, 0, 0, 0, 1, 0], float)
    with open(os.path.join(date_dir, 'calib_cam_to_cam.txt'), 'w') as f:
        f.write('P_rect_02: ' + ' '.join(map(str, P)) + '\n')
        f.write('R_rect_00: ' + ' '.join(map(str, np.eye(3).ravel())) + '\n')
    for fn in ('calib_velo_to_cam.txt', 'calib_imu_to_velo.txt'):
        with open(os.path.join(date_dir, fn), 'w') as f:
            f.write('R: ' + ' '.join(map(str, np.eye(3).ravel())) + '\n')
            f.write('T: 0 0 0\n')
    with open(os.path.join(root, 'split.txt'), 'w') as f:
        f.write('\n'.join(
            '2011_09_26/2011_09_26_drive_0001_sync/image_02/data/' + n
            for n in names))
    return [os.path.join(drive, 'image_02', 'data', n) for n in names]


def emit(name, img_s, extra=None):
    print(json.dumps({'metric': name, 'value': round(img_s, 1),
                      'unit': 'img/s', **(extra or {})}))
    sys.stdout.flush()


def bench_decode(files):
    from PIL import Image
    from packnet_sfm_tpu.datasets import cpp_io

    t0 = time.perf_counter()
    for f in files:
        np.asarray(Image.open(f).convert('RGB'))
    emit('decode_pil_375x1242', len(files) / (time.perf_counter() - t0))

    if cpp_io._load() is not None:
        for f in files[:2]:
            cpp_io.decode_png(f)  # warm
        t0 = time.perf_counter()
        for f in files:
            cpp_io.decode_png(f)
        emit('decode_cpp_375x1242', len(files) / (time.perf_counter() - t0))
    else:
        print(json.dumps({'metric': 'decode_cpp_375x1242',
                          'error': 'libpngio not built'}))


def bench_loader(root, n, cache=''):
    from packnet_sfm_tpu.datasets.kitti import KITTIDataset
    from packnet_sfm_tpu.datasets.transforms import get_transforms
    from packnet_sfm_tpu.datasets.loader import DataLoader
    from packnet_sfm_tpu.datasets.cache import SampleCache

    tf = get_transforms('train', image_shape=(192, 640), jittering=())
    ds = KITTIDataset(path=root, split=os.path.join(root, 'split.txt'),
                      depth_type='groundtruth', back_context=0,
                      forward_context=0, transform=tf)
    if cache:
        ds = SampleCache(ds, mode=cache)
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=4,
                        drop_last=True)
    # epoch 1 (cold for cache modes)
    t0 = time.perf_counter()
    seen = sum(b['rgb'].shape[0] for b in loader)
    cold = seen / (time.perf_counter() - t0)
    # epoch 2 (warm)
    loader.set_epoch(1)
    t0 = time.perf_counter()
    seen = sum(b['rgb'].shape[0] for b in loader)
    warm = seen / (time.perf_counter() - t0)
    tag = cache or 'nocache'
    emit('loader_epoch_cold_{}'.format(tag), cold)
    emit('loader_epoch_warm_{}'.format(tag), warm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=48)
    ap.add_argument('--root', default='/tmp/kitti_loader_bench')
    ap.add_argument('--keep', action='store_true')
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, 'split.txt')):
        files = build_tree(args.root, args.images)
    else:
        drive = os.path.join(args.root, '2011_09_26',
                             '2011_09_26_drive_0001_sync', 'image_02', 'data')
        files = sorted(os.path.join(drive, f) for f in os.listdir(drive))

    bench_decode(files)
    bench_loader(args.root, args.images, cache='')
    bench_loader(args.root, args.images, cache='ram')
    shutil.rmtree('/tmp/packnet_sfm_tpu_cache', ignore_errors=True)
    bench_loader(args.root, args.images, cache='disk')
    if not args.keep:
        shutil.rmtree(args.root, ignore_errors=True)


if __name__ == '__main__':
    main()
