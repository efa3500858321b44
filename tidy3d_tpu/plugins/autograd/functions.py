"""Differentiable operations toolbox for inverse design (jax-native).

Behavioral model: /root/reference/tidy3d/plugins/autograd/functions.py (575
LoC: convolution, morphology, projections, filters — written against the
`autograd` library there; here they are jax-native, which is the natural
backend for this framework).
"""

from __future__ import annotations

from typing import Literal, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

PaddingType = Literal["constant", "edge", "reflect", "symmetric", "wrap"]

_PAD_MODES = {
    "constant": "constant",
    "edge": "edge",
    "reflect": "reflect",
    "symmetric": "symmetric",
    "wrap": "wrap",
}


def pad(array, pad_width, *, mode: PaddingType = "constant", constant_value=0.0):
    """Pad an array along all axes."""
    if np.isscalar(pad_width):
        pad_width = [(pad_width, pad_width)] * jnp.ndim(array)
    kwargs = {}
    if mode == "constant":
        kwargs["constant_values"] = constant_value
    return jnp.pad(array, pad_width, mode=_PAD_MODES[mode], **kwargs)


def convolve(array, kernel, *, padding: PaddingType = "constant",
             mode: str = "same"):
    """N-D convolution with selectable padding."""
    array = jnp.asarray(array)
    kernel = jnp.asarray(kernel)
    if mode == "same" and padding != "constant":
        pw = [(k // 2, k - 1 - k // 2) for k in kernel.shape]
        array = pad(array, pw, mode=padding)
        mode = "valid"
    return jax.scipy.signal.convolve(array, kernel, mode=mode)


# --------------------------------------------------------------------------- #
# morphology
# --------------------------------------------------------------------------- #


def _structuring_kernel(radius: Union[int, Tuple[int, ...]], ndim: int,
                        structure: str = "circular") -> np.ndarray:
    if np.isscalar(radius):
        radius = (radius,) * ndim
    shape = tuple(2 * r + 1 for r in radius)
    if structure == "square":
        return np.ones(shape)
    grids = np.meshgrid(*[np.arange(-r, r + 1) / max(r, 1) for r in radius],
                        indexing="ij")
    dist = sum(g**2 for g in grids)
    return (dist <= 1.0).astype(float)


def grey_dilation(array, size=None, structure=None, mode: PaddingType = "reflect"):
    """Grey-scale dilation (max filter) via padded max pooling."""
    array = jnp.asarray(array)
    kern = structure if structure is not None else _structuring_kernel(
        size if size is not None else 1, array.ndim)
    kern = np.asarray(kern) > 0
    pw = [(s // 2, s - 1 - s // 2) for s in kern.shape]
    padded = pad(array, pw, mode=mode)
    out = jnp.full(array.shape, -jnp.inf, dtype=array.dtype)
    for idx in np.ndindex(kern.shape):
        if not kern[idx]:
            continue
        slices = tuple(slice(i, i + s) for i, s in zip(idx, array.shape))
        out = jnp.maximum(out, padded[slices])
    return out


def grey_erosion(array, size=None, structure=None, mode: PaddingType = "reflect"):
    return -grey_dilation(-jnp.asarray(array), size=size, structure=structure,
                          mode=mode)


def grey_opening(array, size=None, structure=None, mode: PaddingType = "reflect"):
    return grey_dilation(grey_erosion(array, size, structure, mode),
                         size, structure, mode)


def grey_closing(array, size=None, structure=None, mode: PaddingType = "reflect"):
    return grey_erosion(grey_dilation(array, size, structure, mode),
                        size, structure, mode)


def morphological_gradient(array, size=None, structure=None,
                           mode: PaddingType = "reflect"):
    return grey_dilation(array, size, structure, mode) - grey_erosion(
        array, size, structure, mode)


def morphological_gradient_internal(array, size=None, structure=None,
                                    mode: PaddingType = "reflect"):
    return jnp.asarray(array) - grey_erosion(array, size, structure, mode)


def morphological_gradient_external(array, size=None, structure=None,
                                    mode: PaddingType = "reflect"):
    return grey_dilation(array, size, structure, mode) - jnp.asarray(array)


# --------------------------------------------------------------------------- #
# filters / projections
# --------------------------------------------------------------------------- #


def make_kernel(kernel_type: Literal["circular", "conic"], size: Tuple[int, ...],
                normalize: bool = True) -> np.ndarray:
    """Circular (top-hat) or conic filter kernel."""
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in size], indexing="ij")
    dist = np.sqrt(sum(g**2 for g in grids))
    if kernel_type == "circular":
        kern = (dist <= 1.0).astype(float)
    else:
        kern = np.maximum(1.0 - dist, 0.0)
    if normalize and kern.sum() > 0:
        kern = kern / kern.sum()
    return kern


def threshold(array, vmin: float = 0.0, vmax: float = 1.0, level=None):
    """Hard threshold an array to binary {vmin, vmax}."""
    array = jnp.asarray(array)
    if level is None:
        level = (vmin + vmax) / 2
    return jnp.where(array < level, vmin, vmax)


def rescale(array, out_min: float, out_max: float, in_min: float = 0.0,
            in_max: float = 1.0):
    array = jnp.asarray(array)
    scaled = (array - in_min) / (in_max - in_min)
    return scaled * (out_max - out_min) + out_min


def tanh_projection(array, beta: float = 1.0, eta: float = 0.5):
    """Smooth binarization projection (Wang et al. 2011)."""
    array = jnp.asarray(array)
    num = jnp.tanh(beta * eta) + jnp.tanh(beta * (array - eta))
    den = jnp.tanh(beta * eta) + jnp.tanh(beta * (1.0 - eta))
    return num / den


def smooth_min(values, tau: float = 1.0):
    values = jnp.asarray(values)
    return -tau * jax.scipy.special.logsumexp(-values / tau)


def smooth_max(values, tau: float = 1.0):
    values = jnp.asarray(values)
    return tau * jax.scipy.special.logsumexp(values / tau)


def least_squares(fn, x_data, y_data, init_params, max_iterations: int = 100,
                  tol: float = 1e-12):
    """Simple differentiable least-squares fit via Gauss-Newton."""
    params = jnp.asarray(init_params, dtype=float)
    x_data = jnp.asarray(x_data)
    y_data = jnp.asarray(y_data)

    def resid(p):
        return fn(x_data, *p) - y_data

    jac = jax.jacobian(resid)
    for _ in range(max_iterations):
        r = resid(params)
        J = jac(params)
        try:
            step = jnp.linalg.lstsq(J, -r)[0]
        except Exception:
            break
        params = params + step
        if float(jnp.max(jnp.abs(step))) < tol:
            break
    return params


def value_and_grad(fn, argnums=0, has_aux: bool = False):
    """jax.value_and_grad passthrough (API parity with the reference)."""
    return jax.value_and_grad(fn, argnums=argnums, has_aux=has_aux)


def grad(fn, argnums=0, has_aux: bool = False):
    return jax.grad(fn, argnums=argnums, has_aux=has_aux)
