"""Device-resident sampling tables (registered pytrees).

Every distribution the reference samples in its per-read Python loops is
compiled here into a dense inverse-CDF table so a draw becomes
uniform -> compare/searchsorted -> gather, fully batched on the VPU:

* ECDF tables (`first_match`, `match_markov`) — direct array form of the
  reference's interval dicts (profiles/ecdf.py).
* Mixture length distributions (pois_geom / wei_geom, mixed_model.py:41-63) —
  exact CDFs of the mixtures, tabulated to a length cap.
* Truncated log-normal base qualities (model_base_qualities.py:9-20) —
  analytic inverse CDF (no table needed), parameters only.
* KDE length models — fitted points + bandwidth.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..profiles.ecdf import EcdfTable
from ..profiles.error_model import MixtureParams
from ..profiles.kde import KdeModel


def _register(cls, data_fields, static_fields=()):
    jax.tree_util.register_pytree_node(
        cls,
        lambda x: (
            tuple(getattr(x, f) for f in data_fields),
            tuple(getattr(x, f) for f in static_fields),
        ),
        lambda static, data: cls(**dict(zip(data_fields, data)), **dict(zip(static_fields, static))),
    )


@dataclasses.dataclass
class EcdfDevice:
    """Batched inverse-CDF lookup for a binned ECDF profile.

    Compiled to EXACT f32 breakpoints (profiles/ecdf.exact_breakpoints):
    inversion is pure f32 comparisons + one gather, so the result is
    bit-identical across TPU / CPU XLA / the C++ walk replay AND matches the
    reference's float64 floor arithmetic by construction.
    """

    bin_lo: jax.Array  # [n_bins] int32
    breaks: jax.Array  # [n_bins, K] f32 (padded with 2.0)
    vals: jax.Array  # [n_bins, K] int32
    n_bk: jax.Array  # [n_bins] int32

    @classmethod
    def from_table(cls, t: EcdfTable) -> "EcdfDevice":
        from ..profiles.ecdf import exact_breakpoints

        breaks, vals, n_bk = exact_breakpoints(t)
        return cls(
            bin_lo=jnp.asarray(t.bin_lo, jnp.int32),
            breaks=jnp.asarray(breaks),
            vals=jnp.asarray(vals),
            n_bk=jnp.asarray(n_bk),
        )

    def select_bin(self, value: jax.Array) -> jax.Array:
        """[B] conditioning values -> [B] lane indices (clamped fall-through,
        simulator.py:1891-1893)."""
        idx = jnp.searchsorted(self.bin_lo, value, side="right") - 1
        return jnp.clip(idx, 0, self.bin_lo.shape[0] - 1)

    def invert(self, lane: jax.Array, p: jax.Array) -> jax.Array:
        """Batched CDF inversion: [B] lanes, [B] uniforms -> [B] int32 values.

        value = vals[count(breaks <= p) - 1] (count 0 — a p at or below the
        distribution's support, where the reference's own scan matches no
        interval — clamps to the first segment).
        """
        rows = self.breaks[lane]  # [B, K]
        cnt = jnp.sum((rows <= p[:, None]).astype(jnp.int32), axis=-1)
        idx = jnp.clip(cnt - 1, 0, self.n_bk[lane] - 1)
        return self.vals[lane, idx]


_register(EcdfDevice, ("bin_lo", "breaks", "vals", "n_bk"))


def _pois_geom_cdf(lam, p, w, n_max):
    """CDF of the reference's pois_geom draw (mixed_model.py:41-49):
    value = Poisson(lam)+1 with prob w, else Geometric(p) (support >= 1)."""
    ns = np.arange(1, n_max + 1)
    from scipy.stats import geom, poisson

    pois_pmf = poisson.pmf(ns - 1, lam)
    geom_pmf = geom.pmf(ns, p)
    pmf = w * pois_pmf + (1 - w) * geom_pmf
    cdf = np.cumsum(pmf)
    return np.clip(cdf / max(cdf[-1], 1e-12), 0.0, 1.0)


def _wei_geom_cdf(lam, k, p, w, n_max):
    """CDF of the reference's wei_geom draw (mixed_model.py:52-63):
    value = ceil(lam * Weibull(k)) with prob w, else Geometric(p)-1;
    any 0 is clamped to 1."""
    ns = np.arange(1, n_max + 1)
    from scipy.stats import geom

    # P(ceil(lam*W) <= n) = P(W <= n/lam) = 1 - exp(-(n/lam)^k)
    wei_cdf = 1.0 - np.exp(-np.power(ns / lam, k))
    # geometric-1: support 0..; CDF at n is geom.cdf(n+1, p)
    geom_cdf = geom.cdf(ns + 1, p)
    cdf = w * wei_cdf + (1 - w) * geom_cdf  # 0→1 clamp folds P(0) into P(1)
    return np.clip(cdf / max(cdf[-1], 1e-12), 0.0, 1.0)


@dataclasses.dataclass
class MixtureDevice:
    """Inverse-CDF tables for the three error-length distributions.

    Row order matches the walk's error-type encoding: 0=mis, 1=ins, 2=del.
    """

    cdf: jax.Array  # [3, n_max] f32

    @classmethod
    def from_params(cls, params: MixtureParams, n_max: int = 1024) -> "MixtureDevice":
        mis = _pois_geom_cdf(params.mis[0], params.mis[2], params.mis[3], n_max)
        ins = _wei_geom_cdf(params.ins[0], params.ins[1], params.ins[2], params.ins[3], n_max)
        dele = _wei_geom_cdf(params.dele[0], params.dele[1], params.dele[2], params.dele[3], n_max)
        return cls(cdf=jnp.asarray(np.stack([mis, ins, dele]), jnp.float32))

    def sample(self, etype: jax.Array, u: jax.Array) -> jax.Array:
        """[B] error types, [B] uniforms -> [B] int32 lengths >= 1."""
        rows = self.cdf[etype]  # [B, n_max]
        idx = jnp.sum(rows < u[:, None], axis=-1)
        return (idx + 1).astype(jnp.int32)


_register(MixtureDevice, ("cdf",))


@dataclasses.dataclass
class TransErrorDevice:
    """Cumulative error-type transition rows, ERROR_STATES x {mis,ins,del}."""

    cum: jax.Array  # [7, 3] f32 cumulative probs

    @classmethod
    def from_probs(cls, probs: np.ndarray) -> "TransErrorDevice":
        return cls(cum=jnp.asarray(np.cumsum(probs, axis=1), jnp.float32))

    def sample(self, state: jax.Array, u: jax.Array) -> jax.Array:
        """[B] state indices, [B] uniforms -> [B] error type (0/1/2).

        `<=` matches the reference's half-open intervals `k[0] <= p < k[1]`
        (error_list, simulator.py:1860-1863) at exact boundary values.
        """
        rows = self.cum[state]
        return jnp.minimum(jnp.sum(rows <= u[:, None], axis=-1), 2).astype(jnp.int32)


_register(TransErrorDevice, ("cum",))


@dataclasses.dataclass
class KdeDevice:
    """Gaussian KDE sampling state."""

    data: jax.Array  # [n, d] f32
    bandwidth: jax.Array  # scalar f32
    log_transform: bool  # static

    @classmethod
    def from_model(cls, m: KdeModel) -> "KdeDevice":
        return cls(
            data=jnp.asarray(m.data, jnp.float32),
            bandwidth=jnp.asarray(m.bandwidth, jnp.float32),
            log_transform=m.log_transform,
        )

    def sample(self, u_comp: jax.Array, z: jax.Array) -> jax.Array:
        """u_comp ~ U(0,1) [B], z ~ N(0,1) [B] (or [B, d]) -> samples.

        Mirrors sklearn KernelDensity.sample: data[floor(u*n)] + bw * z,
        then the reference's 10**x - 1 for log-space models
        (simulator.py:234-241).
        """
        n = self.data.shape[0]
        i = jnp.minimum((u_comp * n).astype(jnp.int32), n - 1)
        picked = self.data[i]  # [B, d]
        if z.ndim == 1:
            z = z[:, None]
        out = picked + self.bandwidth * z
        if self.log_transform:
            out = jnp.power(10.0, out) - 1.0
        return out[:, 0] if out.shape[1] == 1 else out

    def sample_nearest_pool(self, cond_value, comp_u, z0, z1):
        """Reference-parity aligned-length draw (select_nearest_kde2d,
        simulator.py:108-111): draw a pool of K joint 2D KDE samples per lane
        and return dim-1 of the sample whose dim-0 is nearest cond_value.

        comp_u/z0/z1: [B, K] uniforms and standard normals.
        """
        n = self.data.shape[0]
        i = jnp.minimum((comp_u * n).astype(jnp.int32), n - 1)
        s0 = self.data[i, 0] + self.bandwidth * z0
        s1 = self.data[i, 1] + self.bandwidth * z1
        idx = jnp.argmin(jnp.abs(s0 - cond_value[:, None]), axis=1)
        return jnp.take_along_axis(s1, idx[:, None], axis=1)[:, 0]

    def sample_conditional(self, cond_value: jax.Array, u_comp: jax.Array, z: jax.Array) -> jax.Array:
        """Sample dim-1 conditioned on dim-0 == cond_value (2D KDE).

        Exact conditional of the isotropic Gaussian KDE: component i is chosen
        with weight exp(-(c - data[i,0])^2 / (2 bw^2)), then
        data[i,1] + bw * z.  This replaces the reference's
        nearest-neighbor-of-a-sample-batch approximation
        (select_nearest_kde2d, simulator.py:108-111) with the true
        conditional distribution it approximates.
        """
        d2 = (cond_value[:, None] - self.data[None, :, 0]) ** 2
        logw = -d2 / (2.0 * self.bandwidth**2)
        logw = logw - jax.scipy.special.logsumexp(logw, axis=1, keepdims=True)
        cum = jnp.cumsum(jnp.exp(logw), axis=1)
        i = jnp.sum(cum < u_comp[:, None], axis=1)
        i = jnp.minimum(i, self.data.shape[0] - 1)
        return self.data[i, 1] + self.bandwidth * z


_register(KdeDevice, ("data", "bandwidth"), ("log_transform",))


@dataclasses.dataclass
class QualDevice:
    """Truncated log-normal base-quality parameters per class.

    Class order: 0=match, 1=mis, 2=ins, 3=ht, 4=unmapped
    (model_base_qualities.py:120-130; truncation to [1, 93]).
    """

    sd: jax.Array  # [5] f32
    mu: jax.Array  # [5] f32
    cdf_lo: jax.Array  # [5] f32  lognorm.cdf(1)
    cdf_hi: jax.Array  # [5] f32  lognorm.cdf(93)

    CLASSES = ("match", "mis", "ins", "ht", "unmapped")

    @classmethod
    def from_params(cls, params: dict) -> "QualDevice":
        from scipy.stats import lognorm

        sd = np.array([params[c]["sd"] for c in cls.CLASSES])
        mu = np.array([params[c]["mu"] for c in cls.CLASSES])
        scale = np.exp(mu)
        lo = lognorm.cdf(1.0, sd, scale=scale)
        hi = lognorm.cdf(93.0, sd, scale=scale)
        return cls(
            sd=jnp.asarray(sd, jnp.float32),
            mu=jnp.asarray(mu, jnp.float32),
            cdf_lo=jnp.asarray(lo, jnp.float32),
            cdf_hi=jnp.asarray(hi, jnp.float32),
        )

    def sample(self, qclass: jax.Array, u: jax.Array) -> jax.Array:
        """[..] class indices + uniforms -> int32 qualities in [1, 93].

        Analytic inverse CDF of the truncated lognormal:
        q' = u * (F(93) - F(1)) + F(1);  x = exp(mu + sd * ndtri(q'));
        integer truncation matches scipy rv_discrete.rvs' astype(int).
        """
        sd = self.sd[qclass]
        mu = self.mu[qclass]
        lo = self.cdf_lo[qclass]
        hi = self.cdf_hi[qclass]
        q = u * (hi - lo) + lo
        q = jnp.clip(q, 1e-7, 1.0 - 1e-7)
        x = jnp.exp(mu + sd * _ndtri(q))
        return jnp.clip(x.astype(jnp.int32), 1, 93)


def _ndtri(q):
    return jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * q - 1.0)


_register(QualDevice, ("sd", "mu", "cdf_lo", "cdf_hi"))
