"""The package exports the reference crate's full public surface."""

import streamz_tpu


REFERENCE_PUB_SURFACE = [
    # src/lib.rs pub items (SURVEY.md §1 "public interface" column)
    "DEFAULT_SAMPLE_RATE", "WINDOW_SIZE", "MFCC_SIZE", "WITH_DELTAS",
    "FEATURE_SIZE", "DEFAULT_DROPOUT", "CHECKSUM_CONSTANT",
    "set_checksum_constant_override", "get_checksum_constant",
    "set_wav_cache_enabled", "wav_cache_enabled",
    "augment", "normalize", "average_vectors", "average_features",
    "i16_to_f32", "downmix_to_mono", "resample_to_44100",
    "FeatureExtractor", "with_thread_extractor",
    "pretrain_network", "load_wav_samples", "load_mp3_samples",
    "load_audio_samples", "audio_metadata", "load_and_resample_file",
    "batch_resample", "load_cached_features", "pretrain_from_features",
    "train_from_feature_map", "train_from_files",
    "SimpleNeuralNet",
    "identify_speaker", "identify_speaker_with_threshold",
    "identify_speaker_with_threshold_feats", "identify_speaker_list",
    "extract_embedding", "extract_embedding_from_features",
    "median_embedding_from_features", "identify_speaker_from_embedding",
    "cosine_similarity", "compute_speaker_embeddings",
    "identify_speaker_cosine", "identify_speaker_cosine_feats",
    "cluster_embeddings", "encode_file", "extract_file",
    "extract_file_from_classifier",
]


def test_reference_surface_importable():
    missing = []
    for name in REFERENCE_PUB_SURFACE:
        if name == "augment":
            # device-batched augment lives in dsp.augment (takes a PRNG key)
            from streamz_tpu.dsp.augment import augment  # noqa: F401
            continue
        if not hasattr(streamz_tpu, name):
            missing.append(name)
    assert not missing, f"missing reference API: {missing}"


def test_model_api_surface():
    net = streamz_tpu.SimpleNeuralNet.new(
        input_size=4, hidden1=3, hidden2=2, output=2
    )
    # SimpleNeuralNet method surface (src/lib.rs:744-1281)
    for m in [
        "output_size", "add_output_class", "set_dataset_specs",
        "set_output_layer", "set_encoding_layer", "encoding_layer",
        "output_layer", "record_training_file", "set_embeddings",
        "embedding_size", "forward",
    ]:
        assert hasattr(net, m), m
