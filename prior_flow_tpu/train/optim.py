"""Optimizer + LR schedule matching the reference training recipe.

Reference (train_flow.py:86-91): AdamW(lr, weight_decay, eps) with
OneCycleLR(max_lr=lr, total_steps=num_steps+100, pct_start=0.05,
anneal_strategy='linear', cycle_momentum=False) and gradient clipping at
``clip`` global norm (train_flow.py:143).

The schedule below reproduces torch OneCycleLR's *linear* strategy exactly:
phase 1 (warmup): initial = max_lr/div_factor -> max_lr over pct_start*T;
phase 2 (anneal): max_lr -> max_lr/(div_factor*final_div_factor) over the
rest. Torch defaults div_factor=25, final_div_factor=1e4.
"""

from __future__ import annotations

import optax


def one_cycle_linear(max_lr: float, total_steps: int, pct_start: float = 0.05,
                     div_factor: float = 25.0, final_div_factor: float = 1e4):
    initial = max_lr / div_factor
    final = initial / final_div_factor
    warm = max(int(pct_start * total_steps), 1)
    return optax.join_schedules(
        [optax.linear_schedule(initial, max_lr, warm),
         optax.linear_schedule(max_lr, final, total_steps - warm)],
        boundaries=[warm],
    )


def make_optimizer(lr: float, num_steps: int, wdecay: float = 1e-4,
                   epsilon: float = 1e-8, clip: float = 1.0,
                   pct_start: float = 0.05):
    """AdamW + OneCycle(linear) + global-norm clip, reference recipe."""
    schedule = one_cycle_linear(lr, num_steps + 100, pct_start=pct_start)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon,
                    weight_decay=wdecay),
    )
    return tx, schedule
