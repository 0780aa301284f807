"""Hub-style export (reference `hubconf.py`).

`CPC_audio(pretrained=...)` builds the default CPC model; with
pretrained=True it downloads Facebook's libri-light 60k torch checkpoint and
converts it into the flax parameter tree. Returns a
`cpc2_tpu.feature_loader.ModelBundle` (module + params + config).
"""

import argparse

dependencies = ['jax', 'flax', 'torch']


def CPC_audio(pretrained=False, **kwargs):
    """
    Contrast predictive learning model for audio data
    pretrained: if True, load a model trained on libri-light 60k
    (https://arxiv.org/abs/1912.07875)
    **kwargs : see cpc2_tpu/config.py for the list of possible arguments
    """
    import dataclasses
    from cpc2_tpu.config import get_default_cpc_config
    from cpc2_tpu.io.checkpoint import load_args
    from cpc2_tpu.io.torch_ckpt import params_from_torch_state_dict
    from cpc2_tpu import feature_loader as fl

    loc_args = get_default_cpc_config()
    checkpoint = None
    if pretrained:
        import torch
        checkpoint_url = ('https://dl.fbaipublicfiles.com/librilight/'
                          'CPC_checkpoints/60k_epoch4-d0f474de.pt')
        checkpoint = torch.hub.load_state_dict_from_url(checkpoint_url,
                                                        progress=False)
        load_args(loc_args, argparse.Namespace(**checkpoint["config"]))
    else:
        load_args(loc_args, argparse.Namespace(**kwargs))

    bundle = fl.init_model(loc_args)
    if pretrained:
        params, batch_stats, unmatched = params_from_torch_state_dict(
            checkpoint["weights"], bundle.variables['params'])
        variables = dict(bundle.variables)
        variables['params'] = fl._merge_trees(bundle.variables['params'],
                                              params)
        if batch_stats:
            variables['batch_stats'] = batch_stats
        bundle = dataclasses.replace(bundle, variables=variables)
    return bundle
