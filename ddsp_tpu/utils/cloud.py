"""Cloud helpers: GCS file staging and hypertune metric reporting.

Reference behavior: /root/reference/ddsp/training/cloud.py
(download_from_gstorage:25, make_file_paths_local:48,
report_metric_to_hypertune:82). Kept dependency-light: GCS access shells
out to gsutil when the google-cloud-storage package is absent; hypertune
reporting falls back to writing the JSON the AI-Platform hypertune service
reads.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import time
from typing import List, Union

logger = logging.getLogger('ddsp_tpu')


def download_from_gstorage(gstorage_path: str, local_path: str) -> str:
  """Download a gs:// object to a local path.

  (The reference uses strip('gs:/'), which strips the CHARACTER SET
  {g,s,:,/} from both ends and corrupts names like 'gs://staging-...'
  or blobs ending in g/s - reference cloud.py:38. Prefix removal only.)
  """
  if gstorage_path.startswith('gs://'):
    gstorage_path = gstorage_path[len('gs://'):]
  bucket_name, _, blob_path = gstorage_path.partition('/')
  try:
    from google.cloud import storage  # pylint: disable=g-import-not-at-top
    client = storage.Client()
    bucket = client.get_bucket(bucket_name)
    blob = bucket.blob(blob_path)
    blob.download_to_filename(local_path)
  except ImportError:
    subprocess.run(['gsutil', 'cp', f'gs://{gstorage_path}', local_path],
                   check=True)
  logger.info('Downloaded gs://%s to %s', gstorage_path, local_path)
  return local_path


def make_file_paths_local(paths: Union[str, List[str]],
                          local_dir: str) -> Union[str, List[str]]:
  """Stage gs:// paths into local_dir; local paths pass through.

  Mirrors the reference's gin-file staging (cloud.py:48).
  """
  single = isinstance(paths, str)
  paths_list = [paths] if single else list(paths)
  os.makedirs(local_dir, exist_ok=True)
  out = []
  for path in paths_list:
    if path.startswith('gs://'):
      local_path = os.path.join(local_dir, os.path.basename(path))
      download_from_gstorage(path, local_path)
      out.append(local_path)
    else:
      out.append(path)
  return out[0] if single else out


def report_metric_to_hypertune(metric_value: float, step: int,
                               tag: str = 'train_loss'):
  """Report a metric for AI-Platform hyperparameter tuning.

  Uses the hypertune package when installed; otherwise writes the
  JSON file the service tails (/tmp/hypertune/output.metrics).
  """
  try:
    import hypertune  # pylint: disable=g-import-not-at-top
    hpt = hypertune.HyperTune()
    hpt.report_hyperparameter_tuning_metric(
        hyperparameter_metric_tag=tag,
        metric_value=metric_value,
        global_step=step)
  except ImportError:
    out_dir = os.environ.get('CLOUD_ML_HP_METRIC_FILE',
                             '/tmp/hypertune/output.metrics')
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    with open(out_dir, 'a') as f:
      f.write(json.dumps({'timestamp': time.time(), 'trial': os.environ.get(
          'CLOUD_ML_TRIAL_ID', '0'), tag: float(metric_value),
                          'global_step': int(step)}) + '\n')
