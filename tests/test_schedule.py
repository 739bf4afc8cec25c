"""LR schedule parity vs real torch schedulers (torch-cpu is the oracle).

Mirrors the reference's exact stepping protocol: step the warmup scheduler
for epochs < warmup_epochs, the cosine-restarts scheduler afterwards, always
BEFORE the epoch's training (train_eval.py:1100-1111).
"""

import numpy as np
import pytest

from enhanced_unet_tpu.train.schedule import make_lr_fn, reference_lr_schedule

torch = pytest.importorskip("torch")


def _torch_lr_sequence(base_lr, total_epochs, warmup_epochs, t0, t_mult, eta_min):
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=base_lr, weight_decay=1e-4)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=t_mult, eta_min=eta_min
    )
    warmup = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=0.001, end_factor=1.0, total_iters=warmup_epochs
    )
    lrs = []
    for epoch in range(total_epochs):
        if epoch < warmup_epochs:
            warmup.step()
        else:
            scheduler.step()
        lrs.append(opt.param_groups[0]["lr"])
    return np.asarray(lrs)


@pytest.mark.parametrize(
    "base_lr,total_epochs",
    [(4e-3, 50), (2e-3, 50), (1e-3, 25), (8e-4, 16), (2e-3, 100)],
)
def test_matches_torch(base_lr, total_epochs):
    warmup_epochs = max(1, min(5, total_epochs // 6))  # train_eval.py:122
    t0 = max(10, total_epochs // 3)  # train_eval.py:126
    expected = _torch_lr_sequence(base_lr, total_epochs, warmup_epochs, t0, 2, 1e-7)
    ours = reference_lr_schedule(base_lr, total_epochs, warmup_epochs, t0)
    np.testing.assert_allclose(ours, expected, rtol=1e-10)


def test_restart_happens(self=None):
    # with T_0=10, epochs 50, warmup 5: cosine restarts visible as LR jumps
    lrs = reference_lr_schedule(4e-3, 50, 5, 16)
    diffs = np.diff(lrs)
    assert (diffs > 1e-4).any(), "expected at least one warm restart jump"


def test_lr_fn_lookup():
    table = [0.1, 0.2, 0.3]
    fn = make_lr_fn(table, steps_per_epoch=4)
    assert float(fn(0)) == pytest.approx(0.1)
    assert float(fn(3)) == pytest.approx(0.1)
    assert float(fn(4)) == pytest.approx(0.2)
    assert float(fn(11)) == pytest.approx(0.3)
    assert float(fn(400)) == pytest.approx(0.3)  # clipped
