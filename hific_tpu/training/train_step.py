"""Jitted training steps and train state.

The reference alternates one generator/compression step with
`discriminator_steps` discriminator steps on distinct batches
(train.py:116-136), with three Adam optimizers: `amort` (encoder, generator,
hyper transforms), `hyper` (hyperlatent density params only), `disc`
(train.py:287-301). Here those are two jitted pure functions —
`train_step_g` / `train_step_d` — over a flax.struct TrainState; the host
loop (hific_tpu/cli/train.py) does the alternation. Data parallelism is pure
SPMD: shard the batch over the mesh 'data' axis and jit inserts the gradient
all-reduce (see hific_tpu/parallel/mesh.py).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hific_tpu.config import Config
from hific_tpu.models.hific import HiFiC
from hific_tpu.training.losses import compression_loss, gan_loss
from hific_tpu.training.schedules import scheduled_param


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                     # generator steps taken
    params: Any                           # codec params (no discriminator)
    disc_params: Any                      # discriminator params ({} if none)
    spectral: Any                         # power-iteration state
    opt_state: Any                        # amort+hyper multi-transform state
    disc_opt_state: Any                   # disc Adam state
    rng: jax.Array


def _param_labels(params):
    """'hyper' for the learned hyperlatent density, 'amort' for everything
    else (the Encoder/Generator/hyper-transform group)."""

    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        k: "hyper" if "hyperlatent_density" in k else "amort" for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


def make_optimizers(config: Config):
    def lr_schedule(count):
        return scheduled_param(config.learning_rate, config.lr_schedule, count,
                               config.ignore_schedule)

    model_tx = optax.multi_transform(
        {"amort": optax.adam(lr_schedule), "hyper": optax.adam(lr_schedule)},
        _param_labels,
    )
    disc_tx = optax.adam(lr_schedule)
    return model_tx, disc_tx


def split_params(variables):
    """Split a full HiFiC variables dict into codec params, disc params and
    spectral state."""
    params = dict(variables["params"])
    disc_params = params.pop("discriminator", {})
    spectral = variables.get("spectral", {})
    return params, disc_params, spectral


def create_train_state(config: Config, rng, input_shape=None) -> TrainState:
    model = HiFiC(config)
    if input_shape is None:
        input_shape = (1, config.crop_size, config.crop_size, 3)
    x = jnp.zeros(input_shape, jnp.float32)
    init_rng, quant_rng, noise_rng, state_rng = jax.random.split(rng, 4)
    rngs = {"params": init_rng, "quantize": quant_rng, "noise": noise_rng}
    variables = model.init(rngs, x, training=True)
    if config.use_discriminator:
        inter, _ = model.apply(
            variables, x, training=True, rngs={"quantize": quant_rng,
                                               "noise": noise_rng})
        disc_vars = model.init(
            rngs, inter, train_generator=False,
            method=HiFiC.discriminator_forward)
        variables = {
            "params": {**variables["params"],
                       "discriminator": disc_vars["params"]["discriminator"]},
            "spectral": disc_vars.get("spectral", {}),
        }
    params, disc_params, spectral = split_params(variables)

    model_tx, disc_tx = make_optimizers(config)
    opt_state = model_tx.init(params)
    disc_opt_state = disc_tx.init(disc_params) if config.use_discriminator else ()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        disc_params=disc_params,
        spectral=spectral,
        opt_state=opt_state,
        disc_opt_state=disc_opt_state,
        rng=state_rng,
    )


def ingest_batch(x, config: Config):
    """Accept uint8 batches (1 B/px wire; preferred on TPU) and map them
    on device to the SAME values the host float pipeline produces
    (x/255 [, *2-1]). Float batches pass through unchanged."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
        if config.normalize_input_image:
            x = x * 2.0 - 1.0
    return x


def make_train_step_g(config: Config, lpips_apply=None):
    """Generator/compression step: grads of (compression loss [+ beta*G_loss])
    w.r.t. codec params; amort+hyper Adam updates; step_counter += 1."""

    model = HiFiC(config)
    model_tx, _ = make_optimizers(config)

    def loss_fn(params, disc_params, spectral, x, rng, step):
        variables = {"params": dict(params)}
        rngs = {"quantize": rng}
        if config.sample_noise:
            rngs["noise"] = jax.random.fold_in(rng, 1)
        intermediates, hyperinfo = model.apply(variables, x, training=True,
                                               rngs=rngs)
        loss, diagnostics = compression_loss(
            config, intermediates, lpips_apply, step, config.ignore_schedule)
        new_spectral = spectral
        if config.use_discriminator:
            disc_vars = {"params": {**dict(params),
                                    "discriminator": disc_params}}
            if spectral:
                disc_vars["spectral"] = spectral
            (disc_out), mutated = model.apply(
                disc_vars, intermediates, train_generator=True,
                method=HiFiC.discriminator_forward, mutable=["spectral"])
            _, g_loss = gan_loss(config.gan_loss_type, disc_out)
            loss = loss + config.beta * g_loss
            new_spectral = mutated["spectral"]
            diagnostics["gen_loss"] = g_loss
            diagnostics["weighted_gen_loss"] = config.beta * g_loss
        diagnostics["weighted_compression_loss"] = loss
        return loss, (diagnostics, new_spectral)

    def step_fn(state: TrainState, x):
        x = ingest_batch(x, config)
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (diagnostics, new_spectral)), grads = grad_fn(
            state.params, state.disc_params, state.spectral, x, step_rng,
            state.step)
        updates, new_opt_state = model_tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            spectral=new_spectral,
            opt_state=new_opt_state,
            rng=rng,
        )
        return new_state, diagnostics

    return step_fn


def make_train_step_d(config: Config):
    """Discriminator step on its own batch: grads of D_loss w.r.t. disc
    params only (generator output stop-gradiented)."""

    assert config.use_discriminator
    model = HiFiC(config)
    _, disc_tx = make_optimizers(config)

    def loss_fn(disc_params, params, spectral, x, rng):
        variables = {"params": dict(params)}
        rngs = {"quantize": rng}
        if config.sample_noise:
            rngs["noise"] = jax.random.fold_in(rng, 1)
        intermediates, _ = model.apply(variables, x, training=True, rngs=rngs)
        disc_vars = {"params": {**dict(params), "discriminator": disc_params}}
        if spectral:
            disc_vars["spectral"] = spectral
        disc_out, mutated = model.apply(
            disc_vars, intermediates, train_generator=False,
            method=HiFiC.discriminator_forward, mutable=["spectral"])
        d_loss, _ = gan_loss(config.gan_loss_type, disc_out)
        diagnostics = {
            "disc_loss": d_loss,
            "D_real": jnp.mean(disc_out.d_real),
            "D_gen": jnp.mean(disc_out.d_gen),
        }
        return d_loss, (diagnostics, mutated["spectral"])

    def step_fn(state: TrainState, x):
        x = ingest_batch(x, config)
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (d_loss, (diagnostics, new_spectral)), grads = grad_fn(
            state.disc_params, state.params, state.spectral, x, step_rng)
        updates, new_disc_opt_state = disc_tx.update(
            grads, state.disc_opt_state, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params, updates)
        new_state = state.replace(
            disc_params=new_disc_params,
            spectral=new_spectral,
            disc_opt_state=new_disc_opt_state,
            rng=rng,
        )
        return new_state, diagnostics

    return step_fn


def make_eval_step(config: Config, lpips_apply=None):
    """Validation forward: returns loss diagnostics without updates."""
    model = HiFiC(config)

    def eval_fn(state: TrainState, x, rng):
        x = ingest_batch(x, config)
        variables = {"params": dict(state.params)}
        intermediates, hyperinfo = model.apply(
            variables, x, training=False, rngs={"quantize": rng})
        loss, diagnostics = compression_loss(
            config, intermediates, lpips_apply, state.step,
            config.ignore_schedule)
        diagnostics["weighted_compression_loss"] = loss
        return diagnostics, intermediates

    return eval_fn
