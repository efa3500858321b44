"""Torch bridge: wrap a jax-differentiable function as torch.autograd.Function.

Behavioral model: /root/reference/tidy3d/plugins/pytorch/wrapper.py:8 (the
reference wraps autograd-traced functions; here the backend is jax).
"""

from __future__ import annotations

import numpy as np


def to_torch(fn):
    """Convert a scalar-output jax function into a torch-differentiable one."""
    import jax
    import torch

    value_and_grad_fn = jax.value_and_grad(fn)

    class _JaxFunction(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *args):
            np_args = [np.asarray(a.detach().cpu().numpy()) for a in args]
            value, grads = value_and_grad_fn(*np_args)
            ctx.save_for_backward(*[
                torch.as_tensor(np.asarray(g)) for g in
                (grads if isinstance(grads, (tuple, list)) else (grads,))
            ])
            return torch.as_tensor(np.asarray(value))

        @staticmethod
        def backward(ctx, grad_output):
            return tuple(grad_output * g for g in ctx.saved_tensors)

    def wrapped(*args):
        return _JaxFunction.apply(*args)

    return wrapped
