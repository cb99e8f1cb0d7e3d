"""concepthash_tpu — a TPU-native (JAX/XLA/Pallas/pjit) deep-hashing framework.

Capability-equivalent rebuild of the ConceptHash reference (kamwoh/concepthash,
CVPRW 2024): fine-grained image retrieval by learned binary codes. The compute
path is pure JAX — flax models, pure-function losses, pjit data-parallel
training over a `jax.sharding.Mesh`, bit-packed popcount Hamming retrieval —
rather than a translation of the reference's single-GPU PyTorch trainer stack.

Public surface parity (see SURVEY.md):
  - CLI: ``python main.py dataset=... model=... optim=... model.nbit=...``
  - config groups: dataset/model/backbone/optim/scheduler/transforms
  - manifest datasets: ``data/<ds>/{train,test,database}.txt`` + class_names.txt
  - run-dir artifacts: config.yaml, {train,test}_history.json, models/{best,last}
  - metrics: mAP@R / P@k / R@k over Hamming distance on signed codes
"""

__version__ = "0.1.0"
