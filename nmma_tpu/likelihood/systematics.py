"""Systematic-error model: per-filter, optionally time-dependent sigma_sys.

TPU-native counterpart of ``FilterSystematicsHandler``
(``nmma/em/systematics.py:14-296``). The reference dispatches between four
runtime strategies via bound methods; here the yaml/prior configuration is
resolved once, host-side, into a static per-filter *plan* and the runtime
evaluation is a pure function ``params -> sigma_sys[F, N]`` assembled at
trace time (the per-filter Python loop unrolls into the jaxpr — F is small
and static).

Plans per observed filter:
  ("const", value)                — fixed error budget (no sampled parameter)
  ("param", name)                 — one sampled parameter, constant in time
  ("interp", names, time_nodes)   — sampled node values, piecewise-linear in
                                    time with constant extrapolation
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.interp import masked_interp


def _load_yaml(path_or_dict):
    if isinstance(path_or_dict, dict) or path_or_dict is None:
        return path_or_dict or {}
    import yaml
    with open(path_or_dict) as f:
        return yaml.safe_load(f) or {}


_ALLOWED_KEYS = ("time_range", "time_nodes", "prior", "params", "each", "filters")


def _time_nodes(info, default_range, default_grid="linear"):
    """Resolve a 'time_range'/'time_nodes' spec into node positions.

    Mirrors ``get_time_range`` (nmma/em/systematics.py:123-149).
    """
    num = info.get("time_nodes")
    t_range = str(info.get("time_range", "")).split()
    if num is None and t_range:
        num = t_range.pop(-1)
    if num is None:
        return None
    grid_type = default_grid
    if len(t_range) == 3:
        grid_type, t_start, t_end = t_range
    elif len(t_range) == 2:
        t_start, t_end = t_range
        try:
            float(t_start)
        except ValueError:
            grid_type, t_end = t_range
            t_start = default_range[0]
    else:
        t_start, t_end = default_range
    if "lin" in grid_type:
        return np.linspace(float(t_start), float(t_end), int(num))
    return np.geomspace(float(t_start), float(t_end), int(num))


class SystematicsModel:
    """Static systematics plan + pure runtime evaluation."""

    def __init__(self, filters, systematics=None, error_budget=None,
                 base_name="em_syserr", model_time_range=(0.1, 14.0)):
        self.filters = list(filters)
        self.base_name = base_name
        self.model_time_range = model_time_range
        self.spec = _load_yaml(systematics)
        if error_budget is None:
            error_budget = 1.0
        self.error_budget = error_budget
        self.plans: dict[str, tuple] = {}
        self._resolve()

    # -- static resolution ---------------------------------------------------
    def _prior_name(self, key):
        return f"{self.base_name}_{key}" if key else self.base_name

    def _resolve(self):
        if not self.spec:
            # no yaml: either a sampled em_syserr prior (checked at
            # finalize()) or the constant budget
            for f in self.filters:
                self.plans[f] = ("budget",)
            return

        if "config" in self.spec:
            self._resolve_legacy(self.spec["config"])
            return

        missing = set(self.filters)
        first_key = next(iter(self.spec))
        if first_key in _ALLOWED_KEYS:
            # single global systematic for all filters
            nodes = _time_nodes(self.spec, self.model_time_range)
            for f in self.filters:
                self._assign(f, "", self.spec, nodes)
            return

        for key, info in self.spec.items():
            nodes = _time_nodes(info, self.model_time_range)
            if key in self.filters:
                self._assign(key, key, info, nodes)
                missing.discard(key)
            elif "filters" in info:
                for f in info["filters"]:
                    if f in self.filters:
                        self._assign(f, key, info, nodes)
                        missing.discard(f)
            elif "each" in info:
                for f in info["each"]:
                    if f in self.filters:
                        self._assign(f, key, info, nodes, rename_to=f)
                        missing.discard(f)
            else:
                # shared by all remaining filters
                for f in list(missing):
                    self._assign(f, key, info, nodes)
                missing.discard(f)
                missing = set()
        if missing:
            raise ValueError(
                f"filters missing systematics definitions: {sorted(missing)}"
            )

    def _resolve_legacy(self, config):
        """Legacy ``config.withTime`` format (nmma/em/systematics.py:298-510).

        withTime: per filter-group time-node priors em_syserr_{group}_{n}
        on a linear node grid over the model time range; a null group
        covers the remaining filters as 'all'. withoutTime: one shared
        em_syserr parameter.
        """
        self._legacy_groups = []
        with_time = config.get("withTime", {})
        without_time = config.get("withoutTime", {})
        if with_time.get("value"):
            n_nodes = int(with_time["time_nodes"])
            nodes = np.linspace(self.model_time_range[0],
                                self.model_time_range[1], n_nodes)
            assigned = set()
            groups = with_time.get("filters") or [None]
            named_groups = []
            for group in groups:
                if group is None:
                    continue
                group_list = group if isinstance(group, list) else [group]
                gname = "___".join(group_list)
                named_groups.append((gname, group_list))
                for f in group_list:
                    assigned.add(f)
            remaining = [f for f in self.filters if f not in assigned]
            if any(g is None for g in groups) or not groups:
                named_groups.append(("all", remaining))
            for gname, group_list in named_groups:
                names = tuple(f"em_syserr_{gname}_{n}" for n in range(n_nodes))
                self._legacy_groups.append((gname, names, with_time))
                for f in group_list:
                    if f in self.filters:
                        self.plans[f] = ("interp", names, nodes)
            for f in self.filters:
                self.plans.setdefault(f, ("budget",))
        elif without_time.get("value"):
            self._legacy_groups.append(("", ("em_syserr",), without_time))
            for f in self.filters:
                self.plans[f] = ("param", "em_syserr")

    def _assign(self, filt, key, info, nodes, rename_to=None):
        name = self._prior_name(rename_to if rename_to is not None else key)
        if nodes is None:
            self.plans[filt] = ("param", name)
        else:
            names = [f"{name}_{i}" for i in range(len(nodes))]
            self.plans[filt] = ("interp", tuple(names), nodes)

    def finalize(self, prior_names):
        """Switch budget plans to the sampled em_syserr if it is in the prior.

        Mirrors the reference's from_budget -> from_param promotion
        (nmma/em/systematics.py:186-192).
        """
        for f, plan in self.plans.items():
            if plan[0] == "budget" and self.base_name in prior_names:
                self.plans[f] = ("param", self.base_name)
        # sanity: all referenced parameters must exist
        for f, plan in self.plans.items():
            if plan[0] == "param" and plan[1] not in prior_names:
                raise ValueError(f"systematics prior missing: {plan[1]}")
            if plan[0] == "interp":
                for n in plan[1]:
                    if n not in prior_names:
                        raise ValueError(f"systematics prior missing: {n}")

    def create_priors(self):
        """Build the sampled priors the yaml requests.

        Counterpart of ``setup_systematics_priors``
        (nmma/em/systematics.py:57-101): per-filter / filter-group /
        'each' expansion with per-time-node prior copies. Prior
        expressions in the yaml (e.g. ``Uniform(minimum=0, maximum=2)``)
        are parsed with the same evaluator as .prior files.
        """
        from ..priors.parser import _eval_rhs

        priors = {}
        if not self.spec:
            return priors

        if "config" in self.spec:
            from ..priors import core as prior_core
            for _, names, values in getattr(self, "_legacy_groups", []):
                cls = getattr(prior_core, values.get("type", "Uniform"))
                kwargs = {k: v for k, v in values.items()
                          if k not in ("type", "value", "time_nodes",
                                       "filters")}
                kwargs.setdefault("minimum", kwargs.pop("min", 0.0))
                kwargs.setdefault("maximum", kwargs.pop("max", 2.0))
                for name in names:
                    priors[name] = cls(name=name, **kwargs)
            return priors

        def build(info, names):
            prior_str = info.get("prior")
            if prior_str is None:
                return
            for name in names:
                prior = _eval_rhs(prior_str)
                prior.name = name
                priors[name] = prior

        first_key = next(iter(self.spec))
        specs = {"": self.spec} if first_key in _ALLOWED_KEYS else self.spec
        for key, info in specs.items():
            if not isinstance(info, dict):
                continue
            nodes = _time_nodes(info, self.model_time_range)
            targets = info.get("each", [key])
            for target in targets:
                base = self._prior_name(target)
                if nodes is None:
                    build(info, [base])
                else:
                    build(info, [f"{base}_{i}" for i in range(len(nodes))])
        return priors

    def prior_parameter_names(self):
        names = []
        for plan in self.plans.values():
            if plan[0] == "param":
                names.append(plan[1])
            elif plan[0] == "interp":
                names.extend(plan[1])
        return sorted(set(names))

    # -- pure runtime evaluation --------------------------------------------
    def __call__(self, parameters, obs_times):
        """sigma_sys rows aligned with ``obs_times`` [F, N] (padded)."""
        rows = []
        for f_idx, filt in enumerate(self.filters):
            plan = self.plans[filt]
            t_row = obs_times[f_idx]
            if plan[0] == "budget":
                budget = self.error_budget
                if isinstance(budget, dict):
                    budget = budget.get(filt, 1.0)
                elif isinstance(budget, (list, tuple)):
                    budget = budget[f_idx]
                rows.append(jnp.full(t_row.shape, float(budget)))
            elif plan[0] == "param":
                rows.append(jnp.broadcast_to(
                    jnp.asarray(parameters[plan[1]]), t_row.shape))
            else:
                _, names, nodes = plan
                vals = jnp.stack([jnp.asarray(parameters[n]) for n in names])
                rows.append(masked_interp(t_row, jnp.asarray(nodes), vals))
        return jnp.stack(rows)
