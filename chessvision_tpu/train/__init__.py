"""Training subsystem: optax loops replacing the reference's two torch
trainers (train_unet.py, train_classifier.py), jittable augmentations, and
sharded train steps over a device mesh."""
