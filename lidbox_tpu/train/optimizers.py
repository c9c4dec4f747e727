"""
Config-driven optax optimizers and learning-rate schedules, mirroring the
reference's tf.keras optimizer/schedule factories
(reference: lidbox/models/keras_utils.py:135-140).

Config shape:
    {"cls": "Adam", "kwargs": {"learning_rate": 1e-3,
                               "lr_scheduler": {"cls": "ExponentialDecay",
                                                "kwargs": {...}}}}
"""
import optax

SCHEDULES = {
    # tf.keras.optimizers.schedules names -> optax constructors
    "ExponentialDecay": lambda initial_learning_rate, decay_steps, decay_rate,
                               staircase=False, **kw: optax.exponential_decay(
        init_value=initial_learning_rate, transition_steps=decay_steps,
        decay_rate=decay_rate, staircase=staircase),
    "PiecewiseConstantDecay": lambda boundaries, values, **kw:
        optax.piecewise_constant_schedule(
            init_value=values[0],
            boundaries_and_scales={int(b): values[i + 1] / values[i]
                                   for i, b in enumerate(boundaries)}),
    "CosineDecay": lambda initial_learning_rate, decay_steps, alpha=0.0, **kw:
        optax.cosine_decay_schedule(init_value=initial_learning_rate,
                                    decay_steps=decay_steps, alpha=alpha),
    "PolynomialDecay": lambda initial_learning_rate, decay_steps,
                              end_learning_rate=1e-4, power=1.0, **kw:
        optax.polynomial_schedule(init_value=initial_learning_rate,
                                  end_value=end_learning_rate, power=power,
                                  transition_steps=decay_steps),
    "InverseTimeDecay": lambda initial_learning_rate, decay_steps, decay_rate,
                               staircase=False, **kw:
        (lambda step: initial_learning_rate /
            (1.0 + decay_rate * ((step // decay_steps) if staircase
                                 else step / decay_steps))),
}

OPTIMIZERS = {
    "Adam": lambda learning_rate=1e-3, beta_1=0.9, beta_2=0.999, epsilon=1e-7, **kw:
        optax.adam(learning_rate, b1=beta_1, b2=beta_2, eps=epsilon),
    "AdamW": lambda learning_rate=1e-3, weight_decay=1e-4, beta_1=0.9,
                    beta_2=0.999, epsilon=1e-7, **kw:
        optax.adamw(learning_rate, b1=beta_1, b2=beta_2, eps=epsilon,
                    weight_decay=weight_decay),
    "SGD": lambda learning_rate=0.01, momentum=0.0, nesterov=False, **kw:
        optax.sgd(learning_rate, momentum=momentum or None, nesterov=nesterov),
    "RMSprop": lambda learning_rate=1e-3, rho=0.9, momentum=0.0, epsilon=1e-7, **kw:
        optax.rmsprop(learning_rate, decay=rho, momentum=momentum, eps=epsilon),
    "Adagrad": lambda learning_rate=1e-3, **kw: optax.adagrad(learning_rate),
}


def schedule_from_config(config):
    """{"cls": ..., "kwargs": {...}} -> optax schedule (callable step->lr)."""
    cls = config["cls"]
    if cls not in SCHEDULES:
        raise KeyError(f"unknown LR schedule {cls!r}; valid: {sorted(SCHEDULES)}")
    return SCHEDULES[cls](**config.get("kwargs", {}))


def optimizer_from_config(config):
    """Build (optax optimizer, lr schedule or float) from an optimizer
    config dict; ``lr_scheduler`` inside kwargs is resolved first
    (reference: keras_utils.py:136-140).

    Keras-style ``clipnorm`` / ``clipvalue`` kwargs become optax gradient
    transforms chained before the optimizer."""
    cls = config["cls"]
    if cls not in OPTIMIZERS:
        raise KeyError(f"unknown optimizer {cls!r}; valid: {sorted(OPTIMIZERS)}")
    kwargs = dict(config.get("kwargs", {}))
    lr = kwargs.get("learning_rate", 1e-3)
    if "lr_scheduler" in kwargs:
        lr = schedule_from_config(kwargs.pop("lr_scheduler"))
        kwargs["learning_rate"] = lr
    clipnorm = kwargs.pop("clipnorm", None)
    clipvalue = kwargs.pop("clipvalue", None)
    opt = OPTIMIZERS[cls](**kwargs)
    transforms = []
    if clipnorm is not None:
        transforms.append(optax.clip_by_global_norm(clipnorm))
    if clipvalue is not None:
        transforms.append(optax.clip(clipvalue))
    if transforms:
        opt = optax.chain(*transforms, opt)
    return opt, lr
