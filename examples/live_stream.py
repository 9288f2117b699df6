"""Live microphone streaming stub.

Parity with the reference's ``examples/live_stream.rs`` (1-9): the reference
removed its audio backends for sandbox compatibility (``Cargo.toml:11-13``)
and the example only constructs a network and reports that streaming is
disabled.  A real streaming mode would chunk the mic signal into hop-400
windows and run :func:`streamz_tpu.infer.identify.identify_speaker_list`
incrementally per chunk.
"""

from streamz_tpu.nn.model import SpeakerNet


def main() -> None:
    net = SpeakerNet.new(output=1)
    print(
        "Live streaming disabled: no audio capture backend in this "
        f"environment (model ready: {net.input_size()}-dim input, "
        f"{net.output_size()} speakers)."
    )


if __name__ == "__main__":
    main()
