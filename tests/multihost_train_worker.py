"""Worker for tests/test_multihost.py::test_two_process_train_cli.

Runs the ACTUAL training CLI (`cpc2_tpu.train.main`) as one of two
`jax.distributed` processes over a CPU mesh (4 virtual devices each), with
torch.distributed.launch-style env providing the rank discovery — the full
multi-host driver path: bootstrap -> per-host file shards
(`filter_distributed`) -> loader -> stager
(`jax.make_array_from_process_local_data`) -> compiled step with gradient
psum -> rank-0 checkpoint write.

Usage: python multihost_train_worker.py <pid> <port> <pathDB> <ckptdir>
           <trainlist> <vallist> [extra train.py flags...]
"""

import os
import sys


def main():
    pid, port, db, ck, train_list, val_list = sys.argv[1:7]
    extra = sys.argv[7:]

    os.environ['WORLD_SIZE'] = '2'
    os.environ['RANK'] = pid
    os.environ['LOCAL_RANK'] = '0'
    os.environ['N_NODES'] = '2'
    os.environ['NODE_ID'] = pid
    os.environ['JAX_COORDINATOR_ADDRESS'] = f'localhost:{port}'

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 4)
    jax.config.update('jax_default_matmul_precision', 'highest')

    from cpc2_tpu import train
    train.main(['--pathDB', db, '--file_extension', '.wav',
                '--pathTrain', train_list, '--pathVal', val_list,
                '--pathCheckpoint', ck,
                '--distributed',
                '--hiddenEncoder', '16', '--hiddenGar', '16',
                '--nPredicts', '2', '--negativeSamplingExt', '4',
                '--sizeWindow', '4160', '--batchSizeGPU', '1',
                '--rnnMode', 'linear', '--arMode', 'GRU',
                '--samplingType', 'uniform', '--nEpoch', '1',
                '--save_step', '1', '--random_seed', '17',
                '--logging_step', '50'] + extra)
    print('WORKER_DONE', pid)


if __name__ == '__main__':
    main()
