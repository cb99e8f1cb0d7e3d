"""Config-gated event tracker (utils/logger.Tracker): the reference's
``wandb:`` surface (train_helper.py:125-139) rebuilt as a local JSONL
emitter — disabled by default, no credentials (the reference hardcodes an
API key at train_helper.py:133; deviation documented in utils/logger.py)."""

import json
import os

from concepthash_tpu.utils.logger import (HistoryWriter, Tracker,
                                          wandb_commit, wandb_log)


def test_tracker_disabled_by_default(tmp_path):
    t = Tracker(False, str(tmp_path))
    t.log({"loss": 1.0})
    t.commit()
    assert not os.path.exists(t.path)


def test_tracker_writes_jsonl_events(tmp_path):
    t = Tracker(True, str(tmp_path))
    t.log({"loss": 0.5})
    t.log({"acc": 0.9})          # accumulate into the same pending event
    t.commit()
    t.log({"loss": 0.4})
    t.commit()
    t.commit()                   # empty commit writes nothing
    with open(t.path) as f:
        events = [json.loads(l) for l in f]
    assert events == [{"loss": 0.5, "acc": 0.9}, {"loss": 0.4}]


def test_history_writer_forwards_namespaced(tmp_path):
    t = Tracker(True, str(tmp_path))
    hw = HistoryWriter(str(tmp_path), "train", tracker=t)
    hw.append({"ep": 0, "loss": 1.5})
    with open(t.path) as f:
        events = [json.loads(l) for l in f]
    assert events == [{"train/ep": 0, "train/loss": 1.5}]
    # history JSON itself unchanged by the tracker
    with open(hw.path) as f:
        assert json.load(f) == [{"ep": 0, "loss": 1.5}]


def test_module_hooks_delegate_to_active_tracker(tmp_path):
    t = Tracker(True, str(tmp_path))          # registers as active
    wandb_log({"x": 1})
    wandb_commit()
    with open(t.path) as f:
        assert json.loads(f.readline()) == {"x": 1}


def test_disabled_tracker_deregisters_previous(tmp_path):
    """A wandb=false run after a wandb=true run in the same process must
    stop the module hooks from appending to the finished run's file."""
    import concepthash_tpu.utils.logger as L

    t1 = L.Tracker(True, str(tmp_path / "run1"))
    assert L._active_tracker is t1
    L.Tracker(False, str(tmp_path / "run2"))
    assert L._active_tracker is None
    L.wandb_log({"x": 1})   # must be a no-op, not an append to run1
    L.wandb_commit()
    assert not (tmp_path / "run1" / "events.jsonl").exists()
