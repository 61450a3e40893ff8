"""Namespace package for the TPU-native rebuild of rwth-irt/BayesianPoseEstimation.jl."""
