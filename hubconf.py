"""Hub-style export (reference `hubconf.py`).

`CPC_audio(pretrained=...)` builds the default CPC model; with
pretrained=True it downloads Facebook's libri-light 60k torch checkpoint and
converts it into the flax parameter tree. Returns a
`cpc2_tpu.feature_loader.ModelBundle` (module + params + config).
"""

import argparse

dependencies = ['jax', 'flax', 'torch']


def _bundle_from_hub_payload(checkpoint):
    """Build a ModelBundle from an FB-hub-layout payload: a dict with
    `config` (the training args) and `weights` (a flat CPCModel torch state
    dict, `gEncoder.*`/`gAR.*` keys — what the reference feeds to
    `model.load_state_dict`, `hubconf.py:22-35`). Exercised offline against
    a committed miniature payload (`tests/fixtures/hub_mini_60k.pt`)."""
    import dataclasses
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu.io.checkpoint import load_args
    from cpc2_tpu.io.torch_ckpt import params_from_torch_state_dict
    from cpc2_tpu import feature_loader as fl

    loc_args = get_default_cpc_config()
    load_args(loc_args, argparse.Namespace(**checkpoint["config"]))
    bundle = fl.init_model(loc_args)
    params, batch_stats, _unmatched = params_from_torch_state_dict(
        checkpoint["weights"], bundle.variables['params'])
    variables = dict(bundle.variables)
    variables['params'] = fl._merge_trees(bundle.variables['params'],
                                          params)
    if batch_stats:
        variables['batch_stats'] = batch_stats
    return dataclasses.replace(bundle, variables=variables)


def CPC_audio(pretrained=False, pretrained_path=None, **kwargs):
    """
    Contrast predictive learning model for audio data
    pretrained: if True, load a model trained on libri-light 60k
    (https://arxiv.org/abs/1912.07875)
    pretrained_path: load the pretrained payload from a local file instead
    of the FB URL (extension; useful offline)
    **kwargs : see cpc2_tpu/config.py for the list of possible arguments
    """
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu.io.checkpoint import load_args
    from cpc2_tpu import feature_loader as fl

    if pretrained or pretrained_path is not None:
        import torch
        if pretrained_path is not None:
            checkpoint = torch.load(pretrained_path, map_location='cpu',
                                    weights_only=False)
        else:
            checkpoint_url = ('https://dl.fbaipublicfiles.com/librilight/'
                              'CPC_checkpoints/60k_epoch4-d0f474de.pt')
            checkpoint = torch.hub.load_state_dict_from_url(checkpoint_url,
                                                            progress=False)
        return _bundle_from_hub_payload(checkpoint)

    loc_args = get_default_cpc_config()
    load_args(loc_args, argparse.Namespace(**kwargs))
    return fl.init_model(loc_args)
