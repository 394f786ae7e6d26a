"""Loading the reference's DBoW2 vocabulary format.

The reference ships resources/small_voc.yml.gz (DBoW2 OpenCV-YAML tree
over 384-bit FBrisk descriptors, loaded Frontend.cpp:135-174). A user
switching from the reference can point `vocabulary_path` at such a file;
BinaryVocabulary flattens the tree's words into our matmul codebook."""

import os

import numpy as np
import pytest

REF_VOC = "/root/reference/resources/small_voc.yml.gz"


@pytest.mark.skipif(not os.path.exists(REF_VOC),
                    reason="reference vocabulary not present")
def test_load_reference_small_voc():
    from okvis2_tpu.frontend.bow import BinaryVocabulary

    voc = BinaryVocabulary.load(REF_VOC)
    assert voc.n_words > 500  # k=9, L=3 tree -> up to 729 words
    assert voc.centroid_signs.shape[1] == 512
    # FBrisk descriptors are 48 bytes = 384 bits; padding is zero
    assert np.all(voc.centroid_signs[:, 384:] == 0)
    assert np.all(np.isin(voc.centroid_signs[:, :384], (-1.0, 1.0)))

    # quantisation of the centroids themselves must round-trip:
    # each word's own descriptor lands on itself (or an identical twin)
    ids = voc.quantize(voc.centroid_signs)
    dots_self = np.einsum(
        "ij,ij->i", voc.centroid_signs, voc.centroid_signs
    )
    dots_won = np.einsum(
        "ij,ij->i", voc.centroid_signs, voc.centroid_signs[ids]
    )
    assert np.all(dots_won >= dots_self - 1e-5)

    # a bow vector over a handful of words is normalised and sparse
    v = voc.bow_vector(voc.centroid_signs[:10])
    assert v.shape == (voc.n_words,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
