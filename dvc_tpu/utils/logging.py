"""Run-folder management + logging (reference ``misc/utils.py``).

``build_folder`` auto-renames on collision (reference ``build_floder``,
misc/utils.py:105-126); ``backup_environment`` snapshots the source tree for
experiment provenance (``backup_envir``, misc/utils.py:129-135);
``create_logger`` is a console+file logger.
"""

from __future__ import annotations

import logging
import os
import shutil
import sys


def build_folder(opt) -> str:
    if opt.start_from:
        print('Continue training from id_{}'.format(opt.start_from))
        save_folder = os.path.join(opt.save_dir, opt.start_from)
        assert os.path.exists(save_folder), \
            f'the folder {save_folder} does not exist'
    else:
        save_folder = os.path.join(opt.save_dir, opt.id)
        if os.path.exists(save_folder):
            wait_flag = 1
            while wait_flag:
                new_id = opt.id + '_v_{}'.format(wait_flag)
                save_folder = os.path.join(opt.save_dir, new_id)
                if not os.path.exists(save_folder):
                    opt.id = new_id
                    print(f'Results folder exists, rename it to id_{new_id}')
                    break
                wait_flag += 1
        os.makedirs(save_folder, exist_ok=True)
    return save_folder


def backup_environment(save_folder: str, repo_root: str = '.'):
    """Copy source + configs into save/<id>/backup for provenance."""
    backup = os.path.join(save_folder, 'backup')
    os.makedirs(backup, exist_ok=True)
    for name in ('cfgs', 'dvc_tpu'):
        src = os.path.join(repo_root, name)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(backup, name),
                            dirs_exist_ok=True,
                            ignore=shutil.ignore_patterns('__pycache__'))
    for f in os.listdir(repo_root):
        if f.endswith('.py'):
            shutil.copy(os.path.join(repo_root, f), backup)


def create_logger(folder: str, filename: str) -> logging.Logger:
    log_colors = {'INFO': 'white', 'DEBUG': 'green', 'WARNING': 'yellow',
                  'ERROR': 'red', 'CRITICAL': 'yellow'}
    logger = logging.getLogger('dvc_tpu')
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()

    try:
        import colorlog
        stream = colorlog.StreamHandler(sys.stdout)
        stream.setFormatter(colorlog.ColoredFormatter(
            '%(log_color)s[%(asctime)s] %(message)s',
            datefmt='%m-%d %H:%M:%S', log_colors=log_colors))
    except ImportError:
        stream = logging.StreamHandler(sys.stdout)
        stream.setFormatter(logging.Formatter(
            '[%(asctime)s] %(message)s', datefmt='%m-%d %H:%M:%S'))
    stream.setLevel(logging.INFO)
    logger.addHandler(stream)

    if folder:
        fh = logging.FileHandler(os.path.join(folder, filename))
        fh.setFormatter(logging.Formatter(
            '[%(asctime)s] %(message)s', datefmt='%m-%d %H:%M:%S'))
        fh.setLevel(logging.DEBUG)
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """Scalar metrics sink (the reference's tensorboardX writer,
    train.py:36,211-213,250-254): JSONL always; TensorBoard events too when
    tensorboardX is importable."""

    def __init__(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        self._f = open(os.path.join(folder, 'metrics.jsonl'), 'a')
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(folder)
        except ImportError:
            self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        import json
        self._f.write(json.dumps({'tag': tag, 'value': float(value),
                                  'step': int(step)}) + '\n')
        self._f.flush()
        if self._tb:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._f.close()
        if self._tb:
            self._tb.close()


def print_opt(opt, logger):
    logger.info('|  option  |  value  |')
    for k, v in sorted(opt.to_dict().items()):
        logger.info(f'| {k} | {v} |')
