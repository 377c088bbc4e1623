// Minimal driver over the *reference* implementation (mounted read-only at
// /root/reference), compiled on demand by the test suite and used purely as
// a conformance oracle.  This file is our own; it only calls the reference's
// public API (train_bpe / BaseEncoder, youtokentome/cpp/bpe.h).
//
// Usage:
//   refcli train  <data> <model> <vocab> <coverage> <pad> <unk> <bos> <eos>
//   refcli encode <model> id|subword <bos 0|1> <eos 0|1> <reverse 0|1> <dropout>
//       (reads sentences from stdin, one per line; writes one line per
//        sentence: space-separated ids, or tab-separated subwords)
//   refcli vocab  <model>
//   refcli decode <model>   (reads id lines; writes decoded text)

#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>
#include <vector>

#include "bpe.h"
#include "utils.h"

using namespace vkcom;

int main(int argc, char **argv) {
  if (argc < 2) return 2;
  std::string cmd = argv[1];
  if (cmd == "train") {
    if (argc != 10) return 2;
    BpeConfig config;
    config.character_coverage = atof(argv[5]);
    config.n_threads = 4;
    config.special_tokens.pad_id = atoi(argv[6]);
    config.special_tokens.unk_id = atoi(argv[7]);
    config.special_tokens.bos_id = atoi(argv[8]);
    config.special_tokens.eos_id = atoi(argv[9]);
    Status s = train_bpe(argv[2], argv[3], atoi(argv[4]), config);
    if (!s.ok()) {
      std::cerr << "ERROR: " << s.error_message() << std::endl;
      return 1;
    }
    return 0;
  }
  Status status;
  BaseEncoder enc(argv[2], 2, &status);
  if (!status.ok()) {
    std::cerr << "ERROR: " << status.error_message() << std::endl;
    return 1;
  }
  if (cmd == "encode") {
    if (argc != 8) return 2;
    std::string output_type = argv[3];
    bool bos = atoi(argv[4]), eos = atoi(argv[5]), reverse = atoi(argv[6]);
    double dropout = atof(argv[7]);
    std::string line;
    while (std::getline(std::cin, line)) {
      if (output_type == "id") {
        std::vector<std::vector<int>> ids;
        status = enc.encode_as_ids({line}, &ids, bos, eos, reverse, dropout);
        if (!status.ok()) return 1;
        for (size_t i = 0; i < ids[0].size(); i++)
          std::cout << (i ? " " : "") << ids[0][i];
        std::cout << "\n";
      } else {
        std::vector<std::vector<std::string>> sw;
        status = enc.encode_as_subwords({line}, &sw, bos, eos, reverse, dropout);
        if (!status.ok()) return 1;
        for (size_t i = 0; i < sw[0].size(); i++)
          std::cout << (i ? "\t" : "") << sw[0][i];
        std::cout << "\n";
      }
    }
    return 0;
  }
  if (cmd == "vocab") {
    auto v = enc.vocabulary();
    for (size_t i = 0; i < v.size(); i++) std::cout << i << "\t" << v[i] << "\n";
    return 0;
  }
  if (cmd == "decode") {
    std::string line;
    while (std::getline(std::cin, line)) {
      std::vector<std::string> out;
      status = enc.decode({line}, &out, nullptr);
      if (!status.ok()) return 1;
      std::cout << out[0] << "\n";
    }
    return 0;
  }
  return 2;
}
