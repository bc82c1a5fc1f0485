"""Sampling: registries + dispatch (reference ``sampling.py:13-130``).

The registry surface (predictor/corrector/denoiser names) matches the
reference; implementations are pure functions compiled into ONE
``lax.scan`` program per sampling call — no Python dispatch of the
1000-step loop (the reference pays ~30 ms of sequential forward dispatch
per step; see BASELINE.md).
"""
from __future__ import annotations

_PREDICTORS = {}
_CORRECTORS = {}
_DENOISERS = {}


def _make_register(table, kind):
    def register(fn=None, *, name=None):
        def _register(f):
            local = name if name is not None else f.__name__
            if local in table:
                raise ValueError(f"Already registered {kind} with name: {local}")
            table[local] = f
            return f
        return _register if fn is None else _register(fn)
    return register


register_predictor = _make_register(_PREDICTORS, "predictor")
register_corrector = _make_register(_CORRECTORS, "corrector")
register_denoiser = _make_register(_DENOISERS, "denoiser")


def get_predictor(name):
    return _PREDICTORS[name.lower()]


def get_corrector(name):
    return _CORRECTORS[name.lower()]


def get_denoiser(name):
    return _DENOISERS[name.lower()]


from . import pc as _pc  # noqa: E402,F401  (registers pc components)
from .pc import get_pc_sampler  # noqa: E402,F401
from .ode import get_ode_sampler  # noqa: E402,F401


def get_sampling_fn(config, sde, shape, eps, device=None):
    """Dispatch on ``config.sampling.method`` (reference ``sampling.py:87-130``).
    ``device`` is accepted for signature parity and ignored (placement is
    governed by jit shardings)."""
    method = config.sampling.method.lower()
    if method == "ode":
        return get_ode_sampler(
            sde=sde, shape=shape, eps=eps,
            moll=config.sampling.get("moll", 200),
            side_eps=config.sampling.get("side_eps", 1e-2))
    if method == "pc":
        return get_pc_sampler(
            sde=sde, shape=shape,
            predictor=config.sampling.predictor,
            corrector=config.sampling.corrector,
            denoiser=config.sampling.denoiser,
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            eps=eps)
    raise ValueError(f"Sampler name {config.sampling.method} unknown.")
