"""Device kernels: feature detection/description, descriptor matching.

TPU-native replacements for the reference's C++/VLFeat/FLANN hot loops
(pyfeatures, SURVEY.md §2.2): scale-space detection as conv/pool pipelines,
descriptors as batched patch reductions, matching as blocked MXU matmul
top-2 search.
"""
