"""Resume semantics: a checkpoint stores the just-completed epoch and a
resumed run continues at the NEXT one (reference resnet/train.py:235,334 —
saves epoch+1 / restarts there).  Round-2 review caught an off-by-one that
re-trained the completed epoch on every preemption."""

import jax
import numpy as np

from mrla_tpu.train.cli import main


def test_resume_continues_at_next_epoch(tmp_path):
    run_dir = str(tmp_path / "run")
    base = [
        "-a", "resnet50_mrlal", "--data", "synthetic",
        "--synthetic-steps", "2", "--batch-size", "8", "--image-size", "64",
        "--num-classes", "2", "--output-dir", run_dir,
    ]

    res1 = main(base + ["--epochs", "1"])
    assert [h["epoch"] for h in res1["history"]] == [0]

    # resuming with the SAME epoch budget must train nothing more
    res2 = main(base + ["--epochs", "1", "--resume", run_dir])
    assert res2["history"] == []

    # a larger budget trains exactly the remaining epoch(s)
    res3 = main(base + ["--epochs", "2", "--resume", run_dir])
    assert [h["epoch"] for h in res3["history"]] == [1]
