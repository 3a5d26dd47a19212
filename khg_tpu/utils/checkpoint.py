"""Checkpoint save/load and mid-run resume.

The reference checkpoints only at the end of training (torch.save of
pickled models, egs/yesno/train.py:224-229).  This framework checkpoints
the full training state each EM pass so preempted runs resume exactly:
models, tree, alignments, mixture schedule position, and the RNG state
(explicit generators make the resume bit-exact).

Format: a single pickle file (the model classes define stable
__getstate__), plus a Kaldi-text export alongside for interop/parity
checking (model/kaldi_io.py).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional


def save_checkpoint(path, state: Dict[str, Any]) -> None:
    """Atomic pickle write (tmp file + rename)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Newest iter_*.ckpt in the directory, or None."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    ckpts = sorted(
        ckpt_dir.glob("iter_*.ckpt"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    return ckpts[-1] if ckpts else None


def export_kaldi_text(path, transition_model, am) -> None:
    """Write the Kaldi text form (<TransitionModel> + AM) next to a
    checkpoint for interop with reference/Kaldi tooling."""
    from khg_tpu.model.kaldi_io import write_am_diag_gmm, write_transition_model

    with open(path, "w", encoding="utf-8") as f:
        f.write(write_transition_model(transition_model))
        f.write(write_am_diag_gmm(am))
