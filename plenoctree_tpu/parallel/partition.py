"""Parameter partitioning: tensor-parallel sharding of the MLP over the
mesh "model" axis.

The trunk MLP is column-parallel: every Dense kernel [in, out] with an
`out` divisible by the model-axis size is sharded on its output dim and its
bias likewise; narrow heads (sigma/rgb/bottleneck remainders) stay
replicated. With the ray batch sharded on "data", XLA/GSPMD inserts the
all-gathers at skip-concat/head boundaries and the psum for gradients —
no hand-written collectives (SURVEY.md §2.2 TPU-native plan).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from plenoctree_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path, leaf, model_size):
    name = path[-1] if path else ""
    if leaf.ndim >= 1 and leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= model_size:
        if name == "kernel" and leaf.ndim == 2:
            return P(None, MODEL_AXIS)
        if name == "bias" and leaf.ndim == 1:
            return P(MODEL_AXIS)
    return P()


def param_specs(params, model_size):
    """PartitionSpec pytree for a params tree (see module docstring)."""

    def walk(path, tree):
        if isinstance(tree, dict):
            return {k: walk(path + (k,), v) for k, v in tree.items()}
        return _spec_for(path, tree, model_size)

    return walk((), params)


def shard_variables(variables, mesh):
    """Place a variable collection on the mesh: TP specs on the model axis
    when present, replication otherwise."""
    if MODEL_AXIS not in mesh.shape:
        sh = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sh), variables)
    model_size = mesh.shape[MODEL_AXIS]
    out = dict(variables)
    specs = param_specs(variables["params"], model_size)
    out["params"] = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables["params"],
        specs,
    )
    for k, v in variables.items():
        if k == "params":
            continue
        sh = NamedSharding(mesh, P())
        out[k] = jax.tree.map(lambda x: jax.device_put(x, sh), v)
    return out


def shard_train_state(state, mesh):
    """Shard a TrainState: params (and adam moments) per TP spec, rest
    replicated."""
    from plenoctree_tpu.utils.checkpoints import TrainState

    variables = shard_variables(state.variables, mesh)
    if MODEL_AXIS in mesh.shape:
        model_size = mesh.shape[MODEL_AXIS]
        specs = param_specs(state.variables["params"], model_size)

        def put_like(x, s):
            return jax.device_put(x, NamedSharding(mesh, s))

        def shard_opt(leaf):
            # optax.adam state: ScaleByAdamState(count, mu, nu) — mu/nu mirror
            # the param tree; count is scalar.
            if hasattr(leaf, "shape") and leaf.shape == ():
                return jax.device_put(leaf, NamedSharding(mesh, P()))
            return leaf

        opt_state = jax.tree.map(shard_opt, state.opt_state)
        # mu/nu trees: same structure as params — shard with the same specs.
        new_opt = []
        for part in opt_state:
            if hasattr(part, "mu"):
                part = part._replace(
                    mu=jax.tree.map(put_like, part.mu, specs),
                    nu=jax.tree.map(put_like, part.nu, specs),
                )
            new_opt.append(part)
        opt_state = type(state.opt_state)(new_opt) if isinstance(
            state.opt_state, tuple
        ) else new_opt
        step = jax.device_put(state.step, NamedSharding(mesh, P()))
        return TrainState(step=step, variables=variables, opt_state=opt_state)
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)
