"""Checkpoint/resume semantics of the nested sampler."""

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_logl(ndim=3, sigma=0.1):
    def logl_fn(u):
        x = 20.0 * u - 10.0
        return (-0.5 * jnp.sum((x / sigma) ** 2, axis=-1)
                - 0.5 * ndim * jnp.log(2 * jnp.pi * sigma**2))
    return logl_fn


def test_checkpoint_resume_roundtrip(tmp_path):
    from nmma_tpu.inference import NestedSampler, NestedSamplerConfig
    ckpt = str(tmp_path / "resume.npz")
    cfg = NestedSamplerConfig(nlive=256, n_delete=32, walks=12, dlogz=0.1,
                              chunk_size=5, seed=7,
                              check_point_delta_t=0.0)  # checkpoint every chunk

    # run a few chunks, checkpointing, then stop early via max_iter
    s1 = NestedSampler(_gauss_logl(), 3,
                       NestedSamplerConfig(**{**cfg.__dict__,
                                              "max_iter": 15}))
    res_partial = s1.run(verbose=False, checkpoint_path=ckpt, resume=False)
    assert (tmp_path / "resume.npz").exists()
    assert res_partial.niter == 15

    # resume and run to convergence
    s2 = NestedSampler(_gauss_logl(), 3, cfg)
    res = s2.run(verbose=False, checkpoint_path=ckpt, resume=True)
    assert res.niter > 15
    analytic = -3 * np.log(20.0)
    assert abs(res.logz - analytic) < 5 * max(res.logz_err, 0.1), \
        (res.logz, analytic)

    # fresh full run agrees
    s3 = NestedSampler(_gauss_logl(), 3, cfg)
    res_fresh = s3.run(verbose=False)
    assert abs(res.logz - res_fresh.logz) < 0.5
