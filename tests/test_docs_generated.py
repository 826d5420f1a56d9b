"""The doc performance numbers must be byte-derived from committed JSON.

Guards the round-4 finding of hand-edited numbers appearing in no
committed measurement artifact: gen_docs.py --check fails if README.md /
docs/DESIGN.md's generated blocks disagree with benchmarks/*.json.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_numbers_match_committed_benchmarks():
  r = subprocess.run(
      [sys.executable, os.path.join(REPO, 'benchmarks', 'gen_docs.py'),
       '--check'],
      capture_output=True, text=True, timeout=60, cwd=REPO)
  assert r.returncode == 0, (
      'docs out of date with benchmarks/*.json - run '
      f'benchmarks/gen_docs.py:\n{r.stdout}\n{r.stderr}')
