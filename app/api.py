"""API demo: start a server thread + drive it with a client
(reference `app/api.py`)."""
import argparse
import json
import sys
import threading

sys.path.insert(0, ".")

from umbrella_tpu.api.client import APIClient
from umbrella_tpu.api.server import APIServer
from umbrella_tpu.templates import Prompts, SysPrompts

parser = argparse.ArgumentParser()
parser.add_argument("--configuration", type=str,
                    default="configs/chat_config_8b_v5e.json")
parser.add_argument("--port", type=int, default=65432)
args = parser.parse_args()

with open(args.configuration) as f:
    config = json.load(f)

template = config.pop("template", "meta-llama3")
config.pop("generation_length", None)
config.pop("max_turns", None)


def main():
    server = APIServer(config, port=args.port)
    server.start()

    client = APIClient(port=args.port)
    client.run()
    context = SysPrompts[template] + Prompts[template].format(
        "Tell me about speculative decoding.")
    output = client.get_output(context=context, max_new_tokens=128)
    print(output["generated_text"])
    print("avg_accept_tokens:", output["avg_accept_tokens"],
          "| time_per_output_token:", output["time_per_output_token"], "ms")
    client.close()
    server.shutdown()


if __name__ == "__main__":
    main()
