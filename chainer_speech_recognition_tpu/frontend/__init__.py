"""Audio front-end implementations + selection.

``select_frontend`` is the single place that maps ``features.frontend_impl``
("auto" | "jnp" | "pallas") to a batch-features function, used by the train
step, the eval step, and the decode CLI — so decoding always runs the same
front-end the checkpoint was trained with (BASELINE.json:5 "same feature
parameters").
"""


def select_frontend(features_cfg):
    import jax

    from .jnp_frontend import batch_features
    from .pallas_frontend import batch_features_pallas

    impl = features_cfg.frontend_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    return {"pallas": batch_features_pallas, "jnp": batch_features}[impl]
