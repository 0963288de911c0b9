"""
Dataset factory — dispatch on dataset name, mirroring the reference
(reference: model_wrapper.py:1014-1127 setup_dataset with
KITTI/ncdb/DGP/Image dispatch at :1059-1109), plus 'Synthetic' for
tests/benchmarks.
"""

from packnet_sfm_tpu.datasets.transforms import get_transforms
from packnet_sfm_tpu.datasets.loader import DataLoader, default_collate
from packnet_sfm_tpu.datasets.concat import ConcatDataset
from packnet_sfm_tpu.datasets.synthetic import SyntheticDataset
from packnet_sfm_tpu.datasets.image_dataset import ImageDataset


def setup_dataset(split_cfg, augmentation_cfg, mode):
    """Build the list of datasets for one split from its config node."""
    names = split_cfg.get('dataset', [])
    if not names:
        return []
    paths = split_cfg.get('path', [])
    splits = split_cfg.get('split', [''] * len(names))
    depth_types = split_cfg.get('depth_type', [''] * len(names))
    input_depth_types = split_cfg.get('input_depth_type', [''] * len(names))
    mask_files = split_cfg.get('mask_file', [''] * len(names))
    use_masks = split_cfg.get('use_mask', [False] * len(names))
    back = split_cfg.get('back_context', 0)
    forward = split_cfg.get('forward_context', 0)

    transform = get_transforms(
        'train' if mode == 'train' else
        ('validation' if mode == 'validation' else 'test'),
        image_shape=tuple(augmentation_cfg.get('image_shape', ()) or ()),
        jittering=tuple(augmentation_cfg.get('jittering', ()) or ())
        if mode == 'train' else (),
        crop_train_borders=tuple(
            augmentation_cfg.get('crop_train_borders', ()) or ()),
        crop_eval_borders=tuple(
            augmentation_cfg.get('crop_eval_borders', ()) or ()),
        augmentation=augmentation_cfg,
    )

    datasets = []
    for i, name in enumerate(names):
        common = dict(
            path=paths[i] if i < len(paths) else '',
            split=splits[i] if i < len(splits) else '',
            depth_type=depth_types[i] if i < len(depth_types) else '',
            input_depth_type=(input_depth_types[i]
                              if i < len(input_depth_types) else ''),
            back_context=back, forward_context=forward,
            transform=transform,
        )
        if name == 'KITTI':
            from packnet_sfm_tpu.datasets.kitti import KITTIDataset
            datasets.append(KITTIDataset(**common))
        elif name == 'ncdb':
            from packnet_sfm_tpu.datasets.ncdb import NcdbDataset
            datasets.append(NcdbDataset(
                mask_file=mask_files[i] if i < len(mask_files) else '',
                use_mask=use_masks[i] if i < len(use_masks) else False,
                **common))
        elif name == 'DGP':
            from packnet_sfm_tpu.datasets.dgp import DGPDataset
            cam_list = split_cfg.get('cameras', [[]])
            cams = cam_list[i] if i < len(cam_list) else []
            datasets.append(DGPDataset(
                cameras=cams or ('CAMERA_01',), **common))
        elif name == 'Image':
            common.pop('depth_type'), common.pop('input_depth_type')
            datasets.append(ImageDataset(**common))
        elif name == 'Synthetic':
            datasets.append(SyntheticDataset(
                num_samples=int(splits[i]) if str(splits[i]).isdigit() else 32,
                with_input_depth=bool(input_depth_types[i])
                if i < len(input_depth_types) else False,
                back_context=back, forward_context=forward))
        else:
            raise ValueError('Unknown dataset {}'.format(name))
    return datasets
