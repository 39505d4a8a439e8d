from trigenicinteractionpredictor_tpu.models.mmsbm import ModelState, init_state  # noqa: F401
