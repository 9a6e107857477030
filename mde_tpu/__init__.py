"""mde_tpu — a TPU-native (JAX/Flax/XLA/Pallas) monocular-depth-estimation framework.

Brand-new implementation of the capabilities of the reference project
``HairongLuo/monocular-depth-estimation-cil`` (an ETH-CIL course project built on
PyTorch; see ``SURVEY.md`` at the repo root for the full structural analysis).
Nothing here is a port: models are pure Flax modules, the data pipeline is a
prefetching host loader feeding fused on-device XLA/Pallas transforms, losses and
metrics are single-pass reductions, and training is a jit-compiled data-parallel
step over a ``jax.sharding.Mesh``.

Layout
------
- ``core``      config system (reference ``config.yaml`` schema), PRNG helpers
- ``parallel``  mesh construction + sharding policy (dp today, tp/pp-ready axes)
- ``ops``       TPU kernels: align-corners bilinear resize, windowed attention,
                fused loss reductions, on-device image pipeline
- ``nn``        Flax blocks (RefineNet fusion decoder) + backbone zoo
- ``models``    SimpleUNet / MidasNetSmall / MidasNetSemantics / DPT / LocalBins
- ``losses``    scale-invariant, silog, gradient, edge-aware, combined
- ``metrics``   SI-RMSE, AbsRel, delta thresholds, 7-metric eval suite
- ``data``      list-file dataset, threaded host loader, paired augmentation
- ``train``     jitted train/eval steps, early stopping, checkpoints, logging
- ``tools``     entry points mirroring the reference scripts (main, evaluation,
                visualize, generate_predictions, create_prediction_csv)
"""

__version__ = "0.1.0"
