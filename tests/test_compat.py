"""The `import olmoasr` compatibility shim exposes the reference surface."""


def test_compat_surface():
    import olmoasr

    assert callable(olmoasr.load_model)
    assert "tiny.en" in olmoasr.MODEL2LINK
    assert olmoasr.VARIANT_TO_DIMS["medium"].n_audio_state == 1024

    from olmoasr import preprocess, utils

    assert callable(utils.TranscriptReader)
    assert callable(preprocess.chunk_data)
    assert utils.convert_to_milliseconds("00:00:01.500") == 1500
