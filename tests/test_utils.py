"""Utility tests: StepTimer accounting."""

import time

from enhanced_unet_tpu.utils import StepTimer


def test_step_timer_skips_warmup():
    t = StepTimer(warmup=2)
    for i in range(5):
        with t.step():
            time.sleep(0.01)
    s = t.summary(items_per_step=4)
    assert s["steps"] == 3  # 5 - 2 warmup
    assert s["mean_sec"] >= 0.009
    assert s["items_per_sec"] > 0


def test_step_timer_empty():
    t = StepTimer()
    s = t.summary()
    assert s["steps"] == 0 and s["items_per_sec"] == 0.0
