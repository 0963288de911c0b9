"""
Generic (ray-surface camera) model family
(reference: models/GenericSfmModel.py:10-95, models/GenericSelfSupModel.py:9-120).

The depth net (RaySurfaceResNet) outputs inverse depths + a learned per-pixel
ray surface; the photometric loss projects with the softmax GenericCamera.
"""



from packnet_sfm_tpu.models.sfm import SfmModel
from packnet_sfm_tpu.losses.generic_photometric import (
    GenericMultiViewPhotometricLoss)


class GenericSfmModel(SfmModel):
    """Depth+pose composition where depth output includes a ray surface."""

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        return self.forward_base(batch, train=train)


class GenericSelfSupModel(GenericSfmModel):
    """+ generic (softmax ray projection) photometric loss."""
    generic_photometric_loss: GenericMultiViewPhotometricLoss = \
        GenericMultiViewPhotometricLoss()

    def __call__(self, batch, train=True, progress=0.0, epoch=0):
        output = self.forward_base(batch, train=train)
        if not train:
            return output
        loss_out = self.generic_photometric_loss(
            batch.get('rgb_original', batch['rgb']),
            batch.get('rgb_context_original', batch.get('rgb_context')),
            output['inv_depths'], output['poses'],
            ray_surface=output.get('ray_surface'),
            K=batch.get('intrinsics'), progress=progress)
        return {'loss': loss_out['loss'], 'metrics': loss_out['metrics'],
                **output}
