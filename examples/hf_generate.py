"""HF transformers baseline generation (reference `examples/hf_generate.py`) — the
correctness oracle to diff against our engine's output."""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="meta-llama/Llama-3.2-1B-Instruct")
    parser.add_argument("--prompt", type=str, default="Tell me what you know about Reinforcement Learning in 100 words.")
    parser.add_argument("--max_new_tokens", type=int, default=128)
    args = parser.parse_args()

    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    model = AutoModelForCausalLM.from_pretrained(args.model, torch_dtype=torch.float32)
    ids = tokenizer(args.prompt, return_tensors="pt")
    out = model.generate(**ids, max_new_tokens=args.max_new_tokens, do_sample=False)
    print(tokenizer.decode(out[0], skip_special_tokens=True))


if __name__ == "__main__":
    main()
